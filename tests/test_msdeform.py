import numpy as np
import jax.numpy as jnp

from stereoscene_tpu.ops.msdeform_attn import msdeform_attn


def _naive(value, shapes, locs, weights, num_heads):
    b, _, c = value.shape
    ch = c // num_heads
    q = locs.shape[1]
    out = np.zeros((b, q, num_heads, ch), np.float32)
    for bi in range(b):
        offset = 0
        for lvl, (h, w) in enumerate(shapes):
            v = value[bi, offset:offset + h * w].reshape(h, w, num_heads, ch)
            offset += h * w
            for qi in range(q):
                for hd in range(num_heads):
                    for p in range(locs.shape[4]):
                        x = locs[bi, qi, hd, lvl, p, 0] * w - 0.5
                        y = locs[bi, qi, hd, lvl, p, 1] * h - 0.5
                        x0, y0 = int(np.floor(x)), int(np.floor(y))
                        fx, fy = x - x0, y - y0
                        acc = np.zeros(ch, np.float32)
                        for dy, wy in ((0, 1 - fy), (1, fy)):
                            for dx, wx in ((0, 1 - fx), (1, fx)):
                                yy, xx = y0 + dy, x0 + dx
                                if 0 <= yy < h and 0 <= xx < w:
                                    acc += v[yy, xx, hd] * wx * wy
                        out[bi, qi, hd] += acc * weights[bi, qi, hd, lvl, p]
    return out.reshape(b, q, c)


def test_msdeform_matches_naive():
    rng = np.random.RandomState(0)
    shapes = [(6, 8), (3, 4)]
    b, q, heads, pts, c = 2, 5, 2, 3, 8
    total = sum(h * w for h, w in shapes)
    value = rng.randn(b, total, c).astype(np.float32)
    locs = rng.uniform(-0.1, 1.1, (b, q, heads, len(shapes), pts, 2)).astype(
        np.float32
    )
    weights = rng.rand(b, q, heads, len(shapes), pts).astype(np.float32)

    ours = np.asarray(
        msdeform_attn(
            jnp.asarray(value), shapes, jnp.asarray(locs),
            jnp.asarray(weights), heads,
        )
    )
    ref = _naive(value, shapes, locs, weights, heads)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)
