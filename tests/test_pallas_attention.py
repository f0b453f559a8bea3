"""Pallas flash attention vs the einsum reference (interpreter mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from vface_tpu.ops.attention import multi_head_attention
from vface_tpu.ops.pallas_attention import flash_attention


def test_flash_matches_reference():
    rng = jax.random.PRNGKey(0)
    b, n, h, dh = 2, 512, 4, 32
    d = h * dh
    q = jax.random.normal(rng, (b, n, d), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(1), (b, n, d), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(2), (b, n, d), jnp.float32)
    ref = multi_head_attention(q, k, v, h)
    out = flash_attention(q, k, v, h, block_q=128, block_k=128, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_flash_fallback_on_odd_shapes():
    rng = jax.random.PRNGKey(3)
    b, n, h, dh = 1, 100, 2, 16  # 100 not divisible by any block
    d = h * dh
    q = jax.random.normal(rng, (b, n, d))
    k = jax.random.normal(jax.random.PRNGKey(4), (b, n, d))
    v = jax.random.normal(jax.random.PRNGKey(5), (b, n, d))
    out = flash_attention(q, k, v, h, block_q=64, block_k=64, interpret=True)
    ref = multi_head_attention(q, k, v, h)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_flash_v3_matches_einsum():
    """Transposed-layout (dh-on-sublanes) kernel == einsum attention."""
    import numpy as np

    from vface_tpu.ops.attention import multi_head_attention
    from vface_tpu.ops._archive_attention import flash_attention_v3

    rng = np.random.default_rng(3)
    b, n, h, dh = 2, 256, 4, 40
    q = jnp.asarray(rng.normal(size=(b, n, h * dh)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, n, h * dh)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, n, h * dh)), jnp.float32)
    ref = multi_head_attention(q, k, v, h)
    got = flash_attention_v3(q, k, v, h, block_q=128, block_k=64, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_flash_v4_matches_einsum():
    """k-blocked transposed kernel (grid over kv with scratch) == einsum."""
    import numpy as np

    from vface_tpu.ops.attention import multi_head_attention
    from vface_tpu.ops._archive_attention import flash_attention_v4

    rng = np.random.default_rng(5)
    b, n, h, dh = 2, 256, 4, 40
    q = jnp.asarray(rng.normal(size=(b, n, h * dh)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, n, h * dh)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, n, h * dh)), jnp.float32)
    ref = multi_head_attention(q, k, v, h)
    got = flash_attention_v4(q, k, v, h, block_q=128, block_k=64, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_flash_v5_v6_match_einsum():
    """bf16-operand kernels (v5 natural / v6 transposed layout) == the einsum
    path at bf16 compute dtype — the exact dtype discipline the production
    multi_head_attention uses (bf16 matmul operands, fp32 softmax)."""
    import numpy as np

    from vface_tpu.ops._archive_attention import flash_attention_v6
    from vface_tpu.ops.attention import multi_head_attention
    from vface_tpu.ops.pallas_attention import flash_attention_v5

    rng = np.random.default_rng(7)
    b, n, h, dh = 2, 256, 4, 40
    q = jnp.asarray(rng.normal(size=(b, n, h * dh)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(b, n, h * dh)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(b, n, h * dh)), jnp.bfloat16)
    ref = multi_head_attention(q, k, v, h, dtype=jnp.bfloat16).astype(jnp.float32)
    got5 = flash_attention_v5(q, k, v, h, block_q=128, block_k=64, interpret=True)
    got6 = flash_attention_v6(q, k, v, h, block_q=128, block_k=64, interpret=True)
    # bf16 rounding of the probabilities happens at a different point in the
    # online softmax (per k-block vs once), so allow a few bf16 ulps
    np.testing.assert_allclose(np.asarray(got5, np.float32), ref, atol=0.04, rtol=0.04)
    np.testing.assert_allclose(np.asarray(got6, np.float32), ref, atol=0.04, rtol=0.04)


def test_flash_v5_backward_close_to_einsum_vjp():
    """v5's custom VJP (stats forward + blockwise-recompute backward shared
    with v2) tracks the einsum VJP at bf16-rounding tolerance."""
    import numpy as np

    from vface_tpu.ops.attention import multi_head_attention
    from vface_tpu.ops.pallas_attention import flash_attention_v5

    rng = np.random.default_rng(11)
    b, n, h, dh = 2, 256, 4, 40
    q = jnp.asarray(rng.normal(size=(b, n, h * dh)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(b, n, h * dh)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(b, n, h * dh)), jnp.bfloat16)
    g = jnp.asarray(rng.normal(size=(b, n, h * dh)), jnp.bfloat16)

    def loss_flash(q, k, v):
        out = flash_attention_v5(q, k, v, h, block_q=128, block_k=64, interpret=True)
        return jnp.sum(out.astype(jnp.float32) * g.astype(jnp.float32))

    def loss_ref(q, k, v):
        out = multi_head_attention(q, k, v, h, dtype=jnp.bfloat16)
        return jnp.sum(out.astype(jnp.float32) * g.astype(jnp.float32))

    gq, gk, gv = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    rq, rk, rv = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, r in ((gq, rq), (gk, rk), (gv, rv)):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(r, np.float32), atol=0.25, rtol=0.1
        )


def test_flash_backward_matches_einsum_vjp():
    """The real Pallas flash backward (blockwise recompute, transposed
    layout, softmax stats from the stats-forward) == the einsum VJP — the
    kernel that removes the (N, N) materialisation from training memory."""
    import numpy as np

    from vface_tpu.ops.attention import multi_head_attention
    from vface_tpu.ops.pallas_attention import _flash_v2_stats, flash_attention_bwd

    rng = np.random.default_rng(6)
    b, n, h, dh = 2, 256, 4, 40
    d = h * dh
    q, k, v, g = (
        jnp.asarray(rng.normal(size=(b, n, d)), jnp.float32) for _ in range(4)
    )
    out, m, l = _flash_v2_stats(q, k, v, h, 128, 128, True)
    ref = multi_head_attention(q, k, v, h)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
    dq, dk, dv = flash_attention_bwd(
        q, k, v, m, l, g, h, block_q=128, block_k=128, interpret=True
    )
    _, vjp = jax.vjp(lambda a, b_, c: multi_head_attention(a, b_, c, h), q, k, v)
    rdq, rdk, rdv = vjp(g)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(rdq), atol=2e-5)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(rdk), atol=2e-5)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(rdv), atol=2e-5)
