"""Root-cause probe for the round-4 red grad-parity leaf (verdict item 1).

`test_gradient_parity_all_leaves` failed on the judge's host at exactly one
leaf — ``img_view_transformer.stereo_volume_net.dres4.conv5_deconv.kernel``,
normalized err 0.0210 vs the 2e-2 tolerance at grad scale 2e-4 — while the
same commit passes on this host (err < 2e-2). Two hypotheses from VERDICT.md:

  (a) accumulation-order noise amplified by the max/scale normalization on a
      near-zero-gradient leaf;
  (b) a real ConvTransposeTorch VJP asymmetry in the third hourglass.

This probe decides between them with float64 on both sides:

  1. **Single-module VJP exactness**: dL/dK of ConvTransposeTorch (the exact
     lhs-dilated lowering used by the hourglass decoders) vs torch's
     ConvTranspose3d, identical weights/input/cotangent, both at f64.
     If max|diff| ~ machine eps, hypothesis (b) is dead.
  2. **Full-model noise floor**: the torch oracle's OWN f32-vs-f64 gradient
     distance per leaf (same model, same data, only dtype differs). If the
     failing leaf's self-noise is the same order as the cross-framework
     error, the 2e-2 flat tolerance is measuring rounding noise, not
     implementation divergence — hypothesis (a) proven.

Run: python tools/probe_grad_leaf.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# pin the CPU backend BEFORE jax loads: the parity tests run under the
# conftest's JAX_PLATFORMS=cpu, and on the TPU backend f32 convs default to
# bf16-precision MXU passes — a first run of this probe on the axon backend
# reported ~0.5 normalized "cross errors" that were nothing but that precision
# mode. Apples-to-apples requires the same backend as the test.
os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")


def probe_single_module_vjp():
    """ConvTransposeTorch VJP vs torch ConvTranspose3d at f64."""
    from stereoscene_tpu.models.layers import ConvTransposeTorch

    jax.config.update("jax_enable_x64", True)
    rng = np.random.RandomState(0)
    cin, cout = 16, 8
    x = rng.randn(2, 4, 6, 8, cin).astype(np.float64)
    w = (rng.randn(3, 3, 3, cin, cout) * 0.1).astype(np.float64)
    cot = rng.randn(2, 8, 12, 16, cout).astype(np.float64)

    mod = ConvTransposeTorch(
        features=cout, kernel_size=3, ndim=3, stride=2, padding=1,
        output_padding=1, use_bias=False,
    )
    variables = {"params": {"kernel": jnp.asarray(w)}}

    def loss(v, xx):
        return jnp.sum(mod.apply(v, xx) * jnp.asarray(cot))

    g = jax.grad(loss, argnums=(0, 1))(variables, jnp.asarray(x))
    gk_j = np.asarray(g[0]["params"]["kernel"])
    gx_j = np.asarray(g[1])

    # torch: weight layout [Cin, Cout, kd, kh, kw]; input NCDHW
    xt = torch.from_numpy(np.transpose(x, (0, 4, 1, 2, 3))).requires_grad_()
    wt = torch.from_numpy(
        np.transpose(w, (3, 4, 0, 1, 2))
    ).requires_grad_()
    ct = torch.from_numpy(np.transpose(cot, (0, 4, 1, 2, 3)))
    y = F.conv_transpose3d(xt, wt, stride=2, padding=1, output_padding=1)
    (y * ct).sum().backward()
    gk_t = np.transpose(wt.grad.numpy(), (2, 3, 4, 0, 1))
    gx_t = np.transpose(xt.grad.numpy(), (0, 2, 3, 4, 1))

    dk = np.abs(gk_j - gk_t).max() / np.abs(gk_t).max()
    dx = np.abs(gx_j - gx_t).max() / np.abs(gx_t).max()
    print(f"[1] single-module f64 VJP: dK rel err {dk:.3e}, "
          f"dX rel err {dx:.3e}  (machine-eps => VJP exact)")
    jax.config.update("jax_enable_x64", False)
    return dk, dx


def probe_full_model_noise():
    """Torch-oracle f32 vs f64 self-noise per leaf + jax f32 cross errors."""
    from tests.test_models import TINY, _tiny_batch  # noqa: E402,F401
    from tests.test_grad_parity import (  # noqa: E402
        _labeled_batch, _torch_total_loss,
    )
    from tests.torch_oracle import TorchStereoScene, randomize_state
    from stereoscene_tpu.engine.train import LossConfig, compute_losses
    from stereoscene_tpu.models.detector import BEVDepthOccupancy
    from stereoscene_tpu.models.efficientnet import scaled_stage_settings
    from stereoscene_tpu.utils.convert_reference import (
        build_name_map, convert_reference_checkpoint,
    )

    rng = np.random.RandomState(5)
    batch = _labeled_batch(b=2, rng=rng)
    loss_cfg = LossConfig(downsample=TINY.downsample, dbound=TINY.dbound)

    def torch_grads(dtype):
        torch.manual_seed(0)
        m = TorchStereoScene(TINY).eval()
        randomize_state(m, seed=9)
        m = m.to(dtype)
        tb = {}
        for k, v in batch.items():
            t = torch.from_numpy(np.asarray(v).copy())
            tb[k] = t.to(dtype) if t.dtype == torch.float32 else t
        out = m(tb)
        # _torch_total_loss builds f32 CE weights internally; run the whole
        # loss under the requested default dtype so f64 stays f64
        prev = torch.get_default_dtype()
        torch.set_default_dtype(dtype)
        try:
            from stereoscene_tpu import losses as _l
            import tests.test_grad_parity as tgp

            orig = _l.class_weights_from_frequencies
            tgp.class_weights_from_frequencies = (
                lambda: orig().astype(np.float64 if dtype == torch.float64
                                      else np.float32)
            )
            total = _torch_total_loss(out, tb, loss_cfg)
            print(f"    torch total ({dtype}): {float(total):.6f}")
            total.backward()
        finally:
            tgp.class_weights_from_frequencies = orig
            torch.set_default_dtype(prev)
        named = dict(m.named_parameters())
        sd = {}
        for k, v in m.state_dict().items():
            if k in named and named[k].grad is not None:
                sd[k] = named[k].grad.detach().double().numpy()
            else:
                sd[k] = np.zeros(v.shape, np.float64)
        return sd

    print("[2] torch f32 backward ...")
    g32 = torch_grads(torch.float32)
    print("[2] torch f64 backward ...")
    g64 = torch_grads(torch.float64)

    # jax f32 grads (exact test path)
    model = BEVDepthOccupancy(cfg=TINY)
    shapes = jax.eval_shape(
        lambda k: model.init(k, batch, train=False), jax.random.PRNGKey(0)
    )
    zeros = jax.tree.map(lambda s: np.zeros(s.shape, np.float32), shapes)
    _, stages, _ = scaled_stage_settings(TINY.backbone_arch)
    name_map = build_name_map([len(s) for s in stages])
    torch.manual_seed(0)
    tm = TorchStereoScene(TINY).eval()
    randomize_state(tm, seed=9)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params, stats = convert_reference_checkpoint(
        sd, name_map, zeros["params"], zeros["batch_stats"]
    )

    def loss_fn(p):
        out = model.apply(
            {"params": p, "batch_stats": stats}, batch, train=False
        )
        return sum(jax.tree.leaves(compute_losses(out, batch, loss_cfg)))

    print("[2] jax f32 backward ...")
    total_j, grads_j = jax.value_and_grad(loss_fn)(params)
    print(f"    jax total (f32): {float(total_j):.6f}")

    # map torch grads through the converter (grads transform like weights)
    def to_flax(gdict):
        g = {k: v.astype(np.float32) for k, v in gdict.items()}
        out, _ = convert_reference_checkpoint(
            g, name_map, zeros["params"], zeros["batch_stats"]
        )
        return out

    gt32 = to_flax(g32)
    gt64 = to_flax(g64)

    j_flat = {
        jax.tree_util.keystr(k): np.asarray(v, np.float64)
        for k, v in jax.tree_util.tree_leaves_with_path(grads_j)
    }
    rows = []
    for k, v32 in jax.tree_util.tree_leaves_with_path(gt32):
        key = jax.tree_util.keystr(k)
        a32 = np.asarray(v32, np.float64)
        a64 = np.asarray(
            dict(
                (jax.tree_util.keystr(kk), vv)
                for kk, vv in jax.tree_util.tree_leaves_with_path(gt64)
            )[key],
            np.float64,
        )
        aj = j_flat[key]
        scale = max(np.abs(a64).max(), np.abs(aj).max(), 1e-6)
        self_noise = np.abs(a32 - a64).max() / scale      # torch's own f32 err
        err_x32 = np.abs(aj - a32).max() / scale          # test metric today
        err_x64 = np.abs(aj - a64).max() / scale          # vs f64 oracle
        rows.append((key, scale, self_noise, err_x32, err_x64))

    rows.sort(key=lambda r: -r[3])
    print(f"\n{'leaf':70s} {'scale':>9s} {'self32':>8s} "
          f"{'x-err32':>8s} {'x-err64':>8s}")
    for key, scale, sn, e32, e64 in rows[:15]:
        print(f"{key[:70]:70s} {scale:9.2e} {sn:8.4f} {e32:8.4f} {e64:8.4f}")
    tgt = [r for r in rows if "dres4" in r[0] and "conv5_deconv" in r[0]]
    for key, scale, sn, e32, e64 in tgt:
        print(f"\nTARGET {key}: scale {scale:.2e} torch-self-noise {sn:.4f} "
              f"cross-err-vs-f32 {e32:.4f} cross-err-vs-f64 {e64:.4f}")
    # summary ratios: is cross error explained by per-side rounding noise?
    ratio = [r[3] / max(r[2], 1e-9) for r in rows]
    print(f"\ncross-err / torch-self-noise over all leaves: "
          f"median {np.median(ratio):.2f}, p95 {np.percentile(ratio, 95):.2f},"
          f" max {np.max(ratio):.2f}")
    return rows


def probe_reorder_noise():
    """Accumulation-order noise floor on the EXACT test path: the same
    jax.value_and_grad program run eagerly (op-by-op dispatch) vs under
    whole-program jit (XLA fusion reorders every reduction). The math is
    identical; any per-leaf difference is pure f32 reorder noise — the
    irreducible floor below which a cross-framework comparison measures
    nothing. Prints the distribution and the round-4 red leaf."""
    import torch as _torch

    from tests.test_models import TINY
    from tests.test_grad_parity import _labeled_batch
    from tests.torch_oracle import TorchStereoScene, randomize_state
    from stereoscene_tpu.engine.train import LossConfig, compute_losses
    from stereoscene_tpu.models.detector import BEVDepthOccupancy
    from stereoscene_tpu.models.efficientnet import scaled_stage_settings
    from stereoscene_tpu.utils.convert_reference import (
        build_name_map, convert_reference_checkpoint,
    )

    rng = np.random.RandomState(5)
    batch = _labeled_batch(b=2, rng=rng)
    loss_cfg = LossConfig(downsample=TINY.downsample, dbound=TINY.dbound)
    _torch.manual_seed(0)
    tm = TorchStereoScene(TINY).eval()
    randomize_state(tm, seed=9)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}

    model = BEVDepthOccupancy(cfg=TINY)
    shapes = jax.eval_shape(
        lambda k: model.init(k, batch, train=False), jax.random.PRNGKey(0)
    )
    zeros = jax.tree.map(lambda s: np.zeros(s.shape, np.float32), shapes)
    _, stages, _ = scaled_stage_settings(TINY.backbone_arch)
    name_map = build_name_map([len(s) for s in stages])
    params, stats = convert_reference_checkpoint(
        sd, name_map, zeros["params"], zeros["batch_stats"]
    )

    def loss_fn(p):
        out = model.apply(
            {"params": p, "batch_stats": stats}, batch, train=False
        )
        return sum(jax.tree.leaves(compute_losses(out, batch, loss_cfg)))

    print("[3] eager grads ...")
    g_eager = jax.grad(loss_fn)(params)
    print("[3] jit grads ...")
    g_jit = jax.jit(jax.grad(loss_fn))(params)

    flat_e = jax.tree_util.tree_leaves_with_path(g_eager)
    flat_j = {
        jax.tree_util.keystr(k): np.asarray(v, np.float64)
        for k, v in jax.tree_util.tree_leaves_with_path(g_jit)
    }
    global_scale = max(
        np.abs(np.asarray(v)).max() for _, v in flat_e
    )
    rows = []
    for k, ve in flat_e:
        key = jax.tree_util.keystr(k)
        a = np.asarray(ve, np.float64)
        b = flat_j[key]
        scale = max(np.abs(a).max(), np.abs(b).max(), 1e-6)
        absd = np.abs(a - b).max()
        rows.append((key, scale, absd, absd / scale))
    rows.sort(key=lambda r: -r[3])
    print(f"\nglobal grad scale (max over leaves of max|g|): "
          f"{global_scale:.4e}")
    print(f"{'leaf':70s} {'scale':>9s} {'abs-reorder':>11s} {'norm':>8s}")
    for key, scale, absd, nrm in rows[:12]:
        print(f"{key[:70]:70s} {scale:9.2e} {absd:11.3e} {nrm:8.4f}")
    tgt = [r for r in rows if "dres4" in r[0] and "conv5_deconv" in r[0]
           and "kernel" in r[0]]
    for key, scale, absd, nrm in tgt:
        print(f"\nTARGET {key}: scale {scale:.2e} abs-reorder {absd:.3e} "
              f"normalized {nrm:.4f}")
    worst_abs = max(r[2] for r in rows)
    print(f"\nworst abs reorder noise: {worst_abs:.3e} "
          f"({worst_abs / global_scale:.2e} of global scale)")
    return rows, global_scale


if __name__ == "__main__":
    probe_single_module_vjp()
    probe_reorder_noise()
    probe_full_model_noise()
