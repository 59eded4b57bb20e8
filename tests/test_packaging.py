"""Packaging sanity: the pip-installable surface stays complete.

The reference is a clone-and-run research repo with hard-coded absolute
asset paths (`/root/reference/fk_layer.py:18-19`); this framework instead
vendors its static assets and the C++ sampler source INSIDE the package so
a built wheel is self-contained.  These tests pin that contract without
needing pip/network: they check the declared package-data globs against the
tree and that every console-script target is an importable callable.
"""

import glob
import os
import sys
import tomllib

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _pyproject():
    with open(os.path.join(REPO, "pyproject.toml"), "rb") as f:
        return tomllib.load(f)


def test_assets_resolve_inside_the_package():
    from hm_vae_tpu.ops.topology import ASSETS_DIR

    # package-relative (survives an installed wheel), not repo-root-relative
    assert os.path.basename(os.path.dirname(ASSETS_DIR)) == "hm_vae_tpu"
    for name in ("joint24_parents.json", "skeleton_offsets.npy",
                 "rest_pose_coord.npy", "all_amass_data_mean_std.npy"):
        assert os.path.exists(os.path.join(ASSETS_DIR, name)), name


def test_native_source_resolves_inside_the_package():
    from hm_vae_tpu.data import native_loader

    src = os.path.join(native_loader._NATIVE_DIR, "loader.cpp")
    assert os.path.exists(src)
    assert os.path.basename(
        os.path.dirname(native_loader._NATIVE_DIR)) == "hm_vae_tpu"


def test_native_build_dir_is_overridable_and_cpu_keyed(monkeypatch):
    from hm_vae_tpu.data import native_loader

    monkeypatch.setenv("HM_VAE_TPU_NATIVE_BUILD_DIR", "/tmp/xyz_override")
    assert native_loader._build_dir() == "/tmp/xyz_override"
    monkeypatch.delenv("HM_VAE_TPU_NATIVE_BUILD_DIR")
    d = native_loader._build_dir()
    # keyed by cpu so a -march=native binary never crosses a host migration
    assert os.path.basename(d).startswith("native_")


def test_package_data_globs_cover_the_data_files():
    pkg_data = _pyproject()["tool"]["setuptools"]["package-data"]["hm_vae_tpu"]
    covered = set()
    for pat in pkg_data:
        covered.update(
            os.path.relpath(p, os.path.join(REPO, "hm_vae_tpu"))
            for p in glob.glob(os.path.join(REPO, "hm_vae_tpu", pat)))
    on_disk = set()
    for root, _, files in os.walk(os.path.join(REPO, "hm_vae_tpu")):
        for f in files:
            if not f.endswith((".py", ".pyc", ".so")):
                on_disk.add(os.path.relpath(os.path.join(root, f),
                                            os.path.join(REPO, "hm_vae_tpu")))
    on_disk = {p for p in on_disk if "__pycache__" not in p}
    assert on_disk <= covered, f"data files missing from package-data: {sorted(on_disk - covered)}"


def test_version_matches_pyproject():
    import hm_vae_tpu

    assert hm_vae_tpu.__version__ == _pyproject()["project"]["version"]


def test_console_scripts_are_importable_callables():
    import importlib

    for name, target in _pyproject()["project"]["scripts"].items():
        mod_name, func_name = target.split(":")
        mod = importlib.import_module(mod_name)
        fn = getattr(mod, func_name)
        assert callable(fn), name
        # every CLI main takes argv=None so the entry point signature works
        import inspect

        assert "argv" in inspect.signature(fn).parameters, name
