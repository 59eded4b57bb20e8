"""Full-model numerical parity against a torch oracle.

Builds the encoder/decoder forward pass with torch primitives (F.conv1d /
F.linear / F.interpolate / matmul) driven ENTIRELY by this repo's structure
metadata and parameters: every mask, pooling matrix, stride, padding and
timestep comes from ``hm_vae_tpu.models.structure``, and the weights are
exported from a flax init.  If the two stacks agree on random inputs, the flax
model computes the same function a reference-style PyTorch implementation
would with the same weights — the strongest parity check available without
AMASS checkpoints.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
F = torch.nn.functional

from hm_vae_tpu.models.hm_vae import HMVAE, split_stats
from hm_vae_tpu.models.structure import get_structure
from hm_vae_tpu.utils.config import ModelConfig

CFG = ModelConfig(latent_d=6, shallow_latent_d=6, kernel_size=3, train_seq_len=8)


def t(x):
    return torch.from_numpy(np.asarray(x).copy())


def torch_skeleton_conv(x, w, b, mask, stride, padding):
    xp = F.pad(x, (padding, padding), mode="reflect")
    return F.conv1d(xp, w * mask[:, :, None], b, stride=stride)


def torch_encoder(params, st, x):
    """x: (B, C0, T) torch tensor -> list of z-stat tensors."""
    z_stats = []
    for i, lvl in enumerate(st.encoder_levels):
        p = params["encoder"][f"conv_{i}"]
        x = torch_skeleton_conv(
            x, t(p["weight"]), t(p["bias"]), t(lvl.conv.mask),
            lvl.conv.stride, lvl.conv.padding)
        x = torch.matmul(t(lvl.pool_matrix), x)
        x = F.leaky_relu(x, 0.2)
        B = x.shape[0]
        per_edge = x.reshape(B, lvl.pooled_edges, -1)
        h = params["encoder"][f"latent_head_{i}"]
        z_stats.append(F.linear(per_edge, t(h["kernel"]).T, t(h["bias"])))
    return x, z_stats


def torch_decoder(params, st, cfg, z_list):
    nl = cfg.num_layers
    B = z_list[0].shape[0]
    hier = []
    for i, lvl in enumerate(st.decoder_levels):
        z = z_list[nl - i - 1]
        d = params["decoder"][f"latent_dec_{i}"]
        feats = F.linear(z, t(d["kernel"]).T, t(d["bias"]))
        hier.append(feats.reshape(B, -1, lvl.timestep))
    x = None
    for i, lvl in enumerate(st.decoder_levels):
        if i == 0:
            x = hier[0]
        elif i == nl - 1:
            pre_edges = st.cascade.pooled_edge_num[0]
            T_i = x.shape[-1]
            a = x.reshape(B, pre_edges, -1, T_i)
            bfe = hier[i].reshape(B, pre_edges, -1, T_i)
            x = torch.cat((a, bfe), dim=2).reshape(B, -1, T_i)
        if lvl.upsample:
            x = F.interpolate(x, scale_factor=2, mode="linear",
                              align_corners=False)
        x = torch.matmul(t(lvl.unpool_matrix), x)
        p = params["decoder"][f"conv_{i}"]
        bias = t(p["bias"]) if "bias" in p else None
        x = torch_skeleton_conv(x, t(p["weight"]), bias, t(lvl.conv.mask),
                                lvl.conv.stride, lvl.conv.padding)
        if lvl.leaky:
            x = F.leaky_relu(x, 0.2)
    return x


def test_full_model_matches_torch_oracle():
    cfg = CFG
    st = get_structure(cfg)
    model = HMVAE(cfg)
    B, T = 3, cfg.train_seq_len
    rng = np.random.default_rng(0)
    x = rng.normal(size=(B, T, 24, 6)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = jax.tree.map(np.asarray, variables["params"])

    # --- encoder ---
    _, z_stats = model.apply(variables, jnp.asarray(x), method=HMVAE.encode)
    xt = torch.from_numpy(x.reshape(B, T, -1).transpose(0, 2, 1).copy())
    _, z_ref = torch_encoder(params, st, xt)
    for i, (ours, ref) in enumerate(zip(z_stats, z_ref)):
        np.testing.assert_allclose(
            np.asarray(ours), ref.numpy(), atol=2e-4,
            err_msg=f"encoder level {i}")

    # --- decoder ---
    z_list = [jnp.asarray(split_stats(zs, cfg, i)[0])
              for i, zs in enumerate(z_stats)]
    out = model.apply(variables, z_list, method=HMVAE.decode)
    z_torch = [torch.from_numpy(np.asarray(z).copy()) for z in z_list]
    out_ref = torch_decoder(params, st, cfg, z_torch)
    out_ref = out_ref.permute(0, 2, 1).reshape(B, T, 24, 6)
    np.testing.assert_allclose(
        np.asarray(out), out_ref.numpy(), atol=5e-4)


def test_full_model_matches_oracle_len64_shapes():
    """Same check at the flagship len-64 architecture (coarser tolerance:
    bigger contractions accumulate more fp32 reassociation noise)."""
    cfg = ModelConfig(latent_d=24, shallow_latent_d=12, kernel_size=15,
                      train_seq_len=64)
    st = get_structure(cfg)
    model = HMVAE(cfg)
    B, T = 2, 64
    rng = np.random.default_rng(1)
    x = rng.normal(size=(B, T, 24, 6)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = jax.tree.map(np.asarray, variables["params"])

    _, z_stats = model.apply(variables, jnp.asarray(x), method=HMVAE.encode)
    xt = torch.from_numpy(x.reshape(B, T, -1).transpose(0, 2, 1).copy())
    _, z_ref = torch_encoder(params, st, xt)
    for i, (ours, ref) in enumerate(zip(z_stats, z_ref)):
        scale = max(1.0, float(np.abs(ref.numpy()).max()))
        np.testing.assert_allclose(
            np.asarray(ours) / scale, ref.numpy() / scale, atol=2e-3,
            err_msg=f"encoder level {i}")

    z_list = [jnp.asarray(split_stats(zs, cfg, i)[0])
              for i, zs in enumerate(z_stats)]
    out = model.apply(variables, z_list, method=HMVAE.decode)
    z_torch = [torch.from_numpy(np.asarray(z).copy()) for z in z_list]
    out_ref = torch_decoder(params, st, cfg, z_torch)
    out_ref = out_ref.permute(0, 2, 1).reshape(B, T, 24, 6)
    np.testing.assert_allclose(np.asarray(out), out_ref.numpy(), atol=5e-3)


def test_end_to_end_loss_parity():
    """Full training-loss value parity: hmvae_forward (sample=False) vs the
    same computation done entirely in torch (oracle encoder/decoder + loop FK
    + reference loss weights).  This is SURVEY §4(f)'s 'end-to-end loss parity
    on the tiny CPU-runnable config'."""
    from hm_vae_tpu.train.losses import hmvae_forward
    from hm_vae_tpu.utils.config import Config, LossConfig
    from hm_vae_tpu.ops import fk as fk_mod
    from hm_vae_tpu.ops import rotations as jrot
    from scipy.spatial.transform import Rotation as R

    cfg = Config(
        model=CFG,
        loss=LossConfig(rec_6d_w=1.0, rec_rot_w=1.0, rec_pose_w=10.0,
                        kl_w=0.003, shallow_kl_w=0.003, iteration_interval=0),
    )
    st = get_structure(cfg.model)
    model = HMVAE(cfg.model)
    B, T = 2, 8
    rng = np.random.default_rng(3)
    mats = R.random(B * T * 24, random_state=3).as_matrix().reshape(
        B, T, 24, 3, 3).astype(np.float32)
    six = np.concatenate((mats[..., :, 0], mats[..., :, 1]), axis=-1)
    batch = {"rot_6d": jnp.asarray(six), "rot_mat": jnp.asarray(mats)}
    variables = model.init(jax.random.PRNGKey(0), batch["rot_6d"])

    total, metrics = hmvae_forward(
        model, variables, batch, jax.random.PRNGKey(1),
        jnp.asarray(100, jnp.int32), cfg, sample=False)

    # ---- the same computation in torch ----
    params = jax.tree.map(np.asarray, variables["params"])
    xt = torch.from_numpy(six.reshape(B, T, -1).transpose(0, 2, 1).copy())
    _, z_stats = torch_encoder(params, st, xt)
    mus, kls = [], []
    for i, zs in enumerate(z_stats):
        d = cfg.model.shallow_latent_d if i == 0 else cfg.model.latent_d
        mu, logvar = zs[..., :d], zs[..., d:]
        mus.append(mu)
        kl = (-0.5 * (1 + logvar - mu**2 - logvar.exp()).sum(-1)).mean()
        kls.append(kl)
    out = torch_decoder(params, st, cfg.model, mus)
    out6 = out.permute(0, 2, 1).reshape(B, T, 24, 6)
    # torch 6d->rotmat (reference formula) and loop FK
    x = F.normalize(out6[..., :3], dim=-1, eps=1e-6)
    z = F.normalize(torch.cross(x, out6[..., 3:], dim=-1), dim=-1, eps=1e-6)
    y = torch.cross(z, x, dim=-1)
    outmat = torch.stack((x, y, z), dim=-1)

    from tests.test_fk import numpy_fk_oracle
    from hm_vae_tpu.ops.topology import SMPL24_PARENTS

    offsets = fk_mod.default_offsets()
    pose_pred = numpy_fk_oracle(outmat.detach().numpy().reshape(-1, 24, 3, 3),
                                offsets, SMPL24_PARENTS)
    pose_gt = numpy_fk_oracle(mats.reshape(-1, 24, 3, 3), offsets,
                              SMPL24_PARENTS)

    l6 = ((out6.detach().numpy() - six) ** 2).mean()
    lr = ((outmat.detach().numpy() - mats) ** 2).mean()
    lp = ((pose_pred - pose_gt) ** 2).mean()
    ref_total = (1.0 * l6 + 1.0 * lr + 10.0 * lp
                 + 0.003 * float(kls[3]) + 0.003 * float(kls[0]))

    assert abs(float(total) - ref_total) < 2e-3 * max(1.0, abs(ref_total)), (
        float(total), ref_total)
    np.testing.assert_allclose(float(metrics["loss_rec_6d"]), l6, rtol=1e-3)
    np.testing.assert_allclose(float(metrics["loss_rec_pose"]), lp, rtol=2e-3)
    np.testing.assert_allclose(float(metrics["loss_hier_kl_4"]), float(kls[3]),
                               rtol=1e-3)
