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
    from vface_tpu.ops.pallas_attention import flash_attention_v3

    rng = np.random.default_rng(3)
    b, n, h, dh = 2, 256, 4, 40
    q = jnp.asarray(rng.normal(size=(b, n, h * dh)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, n, h * dh)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, n, h * dh)), jnp.float32)
    ref = multi_head_attention(q, k, v, h)
    got = flash_attention_v3(q, k, v, h, block_q=128, block_k=64, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)
