"""Unit tests for the Pallas kernels (interpret mode) vs jnp references."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hero_tpu.ops.attention import (_fused_attention, mha_reference,
                                    multi_head_attention)
from hero_tpu.ops.layernorm import (_fused_layer_norm, layer_norm,
                                    layer_norm_reference)


def test_mha_reference_masking():
    rng = jax.random.PRNGKey(0)
    B, H, L, d = 2, 2, 16, 8
    q, k, v = jax.random.normal(rng, (3, B, H, L, d))
    mask = jnp.ones((B, L)).at[:, 10:].set(0.0)
    out = mha_reference(q, k, v, mask)
    # changing masked-out keys must not change the output (up to the
    # -1e4 additive-softmax leak, which is ~e^-10000 = 0)
    k2 = k.at[:, :, 10:, :].add(100.0)
    v2 = v.at[:, :, 10:, :].add(100.0)
    out2 = mha_reference(q, k2, v2, mask)
    np.testing.assert_allclose(out, out2, atol=1e-5)


def test_fused_attention_matches_reference():
    rng = jax.random.PRNGKey(1)
    B, H, L, d = 2, 3, 128, 16
    q, k, v = jax.random.normal(rng, (3, B, H, L, d), dtype=jnp.float32)
    mask = jnp.ones((B, L)).at[0, 100:].set(0.0)
    seed = jnp.zeros((1,), jnp.int32)
    out_p = _fused_attention(q, k, v, mask, seed, 0.0, True, False)
    out_r = mha_reference(q, k, v, mask)
    np.testing.assert_allclose(out_p, out_r, atol=2e-5, rtol=2e-5)


def test_fused_attention_grads_match():
    rng = jax.random.PRNGKey(2)
    B, H, L, d = 1, 2, 128, 8
    q, k, v = jax.random.normal(rng, (3, B, H, L, d), dtype=jnp.float32)
    mask = jnp.ones((B, L)).at[:, 90:].set(0.0)
    seed = jnp.zeros((1,), jnp.int32)

    def loss_p(q, k, v):
        return jnp.sum(_fused_attention(q, k, v, mask, seed, 0.0, True, False) ** 2)

    def loss_r(q, k, v):
        return jnp.sum(mha_reference(q, k, v, mask) ** 2)

    gp = jax.grad(loss_p, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gp, gr):
        np.testing.assert_allclose(a, b, atol=2e-4, rtol=2e-4)


def test_multi_head_attention_dispatcher_cpu():
    rng = jax.random.PRNGKey(3)
    B, H, L, d = 2, 2, 20, 8  # unaligned L exercises the jnp path shape
    q, k, v = jax.random.normal(rng, (3, B, H, L, d))
    out = multi_head_attention(q, k, v)
    assert out.shape == (B, H, L, d)


def test_packed_attention_matches_reference():
    """v3 packed-layout kernel (interpret mode) vs the reshaped jnp path."""
    from hero_tpu.ops.attention import packed_attention
    rng = jax.random.PRNGKey(11)
    B, L, H, d = 2, 56, 4, 16
    q, k, v = jax.random.normal(rng, (3, B, L, H * d), dtype=jnp.float32)
    mask = jnp.ones((B, L)).at[0, 40:].set(0.0)
    out_r = packed_attention(q, k, v, H, mask, use_pallas=False)
    out_p = packed_attention(q, k, v, H, mask, use_pallas=True)
    assert out_r.shape == (B, L, H * d)
    np.testing.assert_allclose(out_p, out_r, atol=2e-5, rtol=2e-5)
    # causal
    oc_r = packed_attention(q, k, v, H, mask, causal=True,
                            use_pallas=False)
    oc_p = packed_attention(q, k, v, H, mask, causal=True, use_pallas=True)
    np.testing.assert_allclose(oc_p, oc_r, atol=2e-5, rtol=2e-5)


def test_packed_attention_grads_match():
    from hero_tpu.ops.attention import packed_attention
    rng = jax.random.PRNGKey(12)
    B, L, H, d = 1, 56, 2, 16
    q, k, v = jax.random.normal(rng, (3, B, L, H * d), dtype=jnp.float32)
    mask = jnp.ones((B, L)).at[:, 48:].set(0.0)

    def lp(q, k, v):
        return jnp.sum(packed_attention(q, k, v, H, mask,
                                        use_pallas=True) ** 2)

    def lr(q, k, v):
        return jnp.sum(packed_attention(q, k, v, H, mask,
                                        use_pallas=False) ** 2)

    gp = jax.grad(lp, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(lr, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gp, gr):
        np.testing.assert_allclose(a, b, atol=2e-4, rtol=2e-4)


def test_packed_attention_dropout_deterministic():
    """In-kernel dropout: same rng → identical output; bwd regenerates the
    identical mask (finite, deterministic grads).  The TPU PRNG primitives
    have no CPU interpret lowering, so this runs only on real TPU (the
    verify drive covers it there)."""
    from hero_tpu.ops.attention import packed_attention
    if jax.default_backend() != "tpu":
        pytest.skip("pltpu.prng_seed has no CPU interpret lowering")
    rng = jax.random.PRNGKey(13)
    B, L, H, d = 2, 16, 2, 8
    q, k, v = jax.random.normal(rng, (3, B, L, H * d), dtype=jnp.float32)
    dr = jax.random.PRNGKey(5)
    o1 = packed_attention(q, k, v, H, dropout_rate=0.3, dropout_rng=dr,
                          use_pallas=True)
    o2 = packed_attention(q, k, v, H, dropout_rate=0.3, dropout_rng=dr,
                          use_pallas=True)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
    g = jax.grad(lambda qq: jnp.sum(packed_attention(
        qq, k, v, H, dropout_rate=0.3, dropout_rng=dr,
        use_pallas=True) ** 2))(q)
    assert np.isfinite(np.asarray(g)).all()


def test_dropout_add_layer_norm_fused():
    """Fused LN(dropout(y)+x): interpret-mode kernel (rate=0) vs jnp; the
    dropout path needs the TPU PRNG, covered by the TPU drive."""
    from hero_tpu.ops.layernorm import dropout_add_layer_norm
    rng = jax.random.PRNGKey(20)
    y = jax.random.normal(rng, (24, 128))
    x = jax.random.normal(jax.random.fold_in(rng, 1), (24, 128))
    w = jax.random.normal(jax.random.fold_in(rng, 2), (128,)) + 1.0
    b = jax.random.normal(jax.random.fold_in(rng, 3), (128,))
    want = dropout_add_layer_norm(y, x, w, b, use_pallas=False)
    got = dropout_add_layer_norm(y, x, w, b, use_pallas=True)
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)

    def lp(y, x, w, b):
        return jnp.sum(dropout_add_layer_norm(y, x, w, b,
                                              use_pallas=True) ** 3)

    def lr(y, x, w, b):
        return jnp.sum(dropout_add_layer_norm(y, x, w, b,
                                              use_pallas=False) ** 3)

    gp = jax.grad(lp, argnums=(0, 1, 2, 3))(y, x, w, b)
    gr = jax.grad(lr, argnums=(0, 1, 2, 3))(y, x, w, b)
    for a, b_ in zip(gp, gr):
        np.testing.assert_allclose(a, b_, atol=5e-4, rtol=5e-4)


def test_dropout_add_layer_norm_jnp_dropout():
    """jnp fallback with dropout: mean preserved, zeros where dropped."""
    from hero_tpu.ops.layernorm import dropout_add_layer_norm
    y = jnp.ones((64, 32))
    x = jnp.zeros((64, 32))
    w = jnp.ones((32,))
    b = jnp.zeros((32,))
    out = dropout_add_layer_norm(y, x, w, b, rate=0.5,
                                 rng=jax.random.PRNGKey(0),
                                 use_pallas=False)
    assert out.shape == (64, 32) and np.isfinite(np.asarray(out)).all()


def test_nn_dropout_statistics():
    """uint16-bits dropout: drop rate within the k/65536 quantization of
    the requested rate, survivors scaled by exactly 1/(1-rate), rate~1
    drops everything, and rng=None / rate=0 are identity."""
    from hero_tpu.models.nn import dropout
    x = jnp.ones((512, 512))
    for rate in (0.1, 0.5, 0.9):
        out = np.asarray(dropout(x, rate, jax.random.PRNGKey(7)))
        dropped = (out == 0.0).mean()
        # binomial std over 262k draws ~ 1e-3; allow 5 sigma
        assert abs(dropped - rate) < 5e-3, (rate, dropped)
        kept = out[out != 0.0]
        np.testing.assert_allclose(kept, 1.0 / (1.0 - rate), rtol=1e-6)
    assert np.asarray(dropout(x, 1.0, jax.random.PRNGKey(0))).sum() == 0.0
    assert dropout(x, 0.5, None) is x
    assert dropout(x, 0.0, jax.random.PRNGKey(0)) is x


def test_layer_norm_matches_reference():
    rng = jax.random.PRNGKey(4)
    x = jax.random.normal(rng, (10, 3, 256)) * 3 + 1
    w = jax.random.normal(jax.random.PRNGKey(5), (256,))
    b = jax.random.normal(jax.random.PRNGKey(6), (256,))
    ref = layer_norm_reference(x, w, b)
    x2 = x.reshape(-1, 256)
    n = x2.shape[0]
    pad = (-n) % 8
    x2p = jnp.pad(x2, ((0, pad), (0, 0)))
    out = _fused_layer_norm(x2p, w, b, 1e-5, True)[:n].reshape(x.shape)
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-5)


def test_layer_norm_grads_match():
    rng = jax.random.PRNGKey(7)
    x = jax.random.normal(rng, (16, 128))
    w = jnp.ones((128,)) * 1.5
    b = jnp.zeros((128,))

    def loss_p(x, w, b):
        return jnp.sum(_fused_layer_norm(x, w, b, 1e-5, True) ** 3)

    def loss_r(x, w, b):
        return jnp.sum(layer_norm_reference(x, w, b) ** 3)

    gp = jax.grad(loss_p, argnums=(0, 1, 2))(x, w, b)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(x, w, b)
    for a, b_ in zip(gp, gr):
        np.testing.assert_allclose(a, b_, atol=5e-4, rtol=5e-4)


def test_layer_norm_public_wrapper():
    x = jax.random.normal(jax.random.PRNGKey(8), (3, 7, 64))
    w = jnp.ones((64,))
    b = jnp.zeros((64,))
    out = layer_norm(x, w, b)  # jnp path on CPU
    np.testing.assert_allclose(out, layer_norm_reference(x, w, b),
                               atol=1e-6)


# ---------------------------------------------------------------------------
# segment-mask (sub packing) attention
# ---------------------------------------------------------------------------

def _seg_onehot(seg_ids, S, dtype=jnp.float32):
    """(B, L) int ids with -1 = invalid → (B, L, S) one-hot (zeros row
    for invalid slots)."""
    return jax.nn.one_hot(seg_ids, S, dtype=dtype)


def _unpacked_rows(q, k, v, seg_ids, S, H, use_pallas):
    """Ground truth: run every segment as its own (masked) row."""
    from hero_tpu.ops.attention import packed_attention
    B, L, D = q.shape
    outs = jnp.zeros_like(q)
    for s in range(S):
        m = (seg_ids == s).astype(jnp.float32)          # (B, L)
        o = packed_attention(q, k, v, H, m, use_pallas=use_pallas)
        outs = outs + o * m[..., None]
    return outs


@pytest.mark.parametrize("use_pallas", [False, True])
def test_packed_attention_segment_mask(use_pallas):
    """Packed rows with a (B, L, S) segment one-hot ≡ per-segment rows.

    Exactness argument (ops/attention.py packed_attention docstring):
    cross-segment and invalid-slot scores carry the -1e4 bias, whose
    exp underflows to exactly 0.0 in fp32, so each token's softmax and
    value contraction see bit-identical contributions either way."""
    rng = jax.random.PRNGKey(3)
    B, L, D, H, S = 2, 56, 64, 4, 5
    q, k, v = (jax.random.normal(rng, (3, B, L, D)) / 8).astype(jnp.float32)
    # segments laid out contiguously with some invalid (-1) tail slots
    ids = np.full((B, L), -1, np.int32)
    bounds = [0, 11, 25, 31, 44, 50]
    for b in range(B):
        for s in range(S):
            ids[b, bounds[s]:bounds[s + 1]] = s
    seg = _seg_onehot(jnp.asarray(ids), S)
    from hero_tpu.ops.attention import packed_attention
    packed = packed_attention(q, k, v, H, seg, use_pallas=use_pallas)
    want = _unpacked_rows(q, k, v, jnp.asarray(ids), S, H,
                          use_pallas=use_pallas)
    valid = (ids >= 0)[..., None]
    np.testing.assert_allclose(np.where(valid, packed, 0.0),
                               np.where(valid, want, 0.0),
                               atol=2e-6, rtol=1e-5)


def test_packed_attention_segment_grads():
    """Seg-mode backward (shared saved-probs kernel) vs jnp-path grads."""
    rng = jax.random.PRNGKey(4)
    B, L, D, H, S = 1, 24, 32, 2, 3
    q, k, v = (jax.random.normal(rng, (3, B, L, D)) / 8).astype(jnp.float32)
    ids = jnp.asarray(np.array([[0] * 7 + [1] * 6 + [2] * 9 + [-1] * 2]))
    seg = _seg_onehot(ids, S)
    from hero_tpu.ops.attention import packed_attention

    def loss(qq, kk, vv, pallas):
        o = packed_attention(qq, kk, vv, H, seg, use_pallas=pallas)
        return jnp.sum((o * (ids >= 0)[..., None]) ** 2)

    gp = jax.grad(loss, argnums=(0, 1, 2))(q, k, v, True)
    gr = jax.grad(loss, argnums=(0, 1, 2))(q, k, v, False)
    for a, b in zip(gp, gr):
        np.testing.assert_allclose(a, b, atol=2e-5, rtol=1e-4)
