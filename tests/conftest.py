"""Test harness config: force an 8-device virtual CPU mesh.

Multi-chip sharding is validated on virtual CPU devices exactly as the
driver's dryrun does (no TPU needed to run the suite).

The session's sitecustomize registers the tunneled-TPU ("axon") PJRT plugin
at interpreter startup and selects it via ``jax_platforms`` — plain
``JAX_PLATFORMS=cpu`` in the environment is overridden by that registration,
so we must reset the *config value* after jax is imported.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = flags + " --xla_force_host_platform_device_count=8"
if "xla_cpu_collective_call_warn_stuck_timeout_seconds" not in flags:
    # 8 virtual devices time-slice ONE physical core; when another heavy
    # process shares the host, XLA-CPU's default 40 s collective rendezvous
    # HARD-KILLS the test process mid-suite (observed: pytest dying with no
    # summary while an XLA compile ran alongside). Raise all three timeouts —
    # harmless on an idle host.
    flags = (
        flags
        + " --xla_cpu_collective_call_warn_stuck_timeout_seconds=600"
        + " --xla_cpu_collective_call_terminate_timeout_seconds=7200"
        + " --xla_cpu_collective_timeout_seconds=7200"
    )
os.environ["XLA_FLAGS"] = flags.strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache: the suite is compile-bound on this 1-core
# host; warm runs drop from ~10 min to ~2 min.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)


@pytest.fixture(scope="session")
def tiny_bundle():
    """One tiny VFaceModel + params shared across the whole suite (model init
    costs ~30-60 s on this 1-core host; pay it once).

    The UNet's zero-initialised output convs are perturbed: with exact zeros
    the eps output is IDENTICALLY 0 regardless of the attention internals
    (everything flows through out_conv), which silently weakens every
    equivalence/injection test to a tautology."""
    import jax.numpy as jnp

    from vface_tpu.models import ModelConfig, VFaceModel

    model = VFaceModel(ModelConfig.tiny(image_size=32))
    params = model.init(jax.random.PRNGKey(0))

    def perturb(tree, key_path=""):
        flat = jax.tree_util.tree_flatten_with_path(tree)
        leaves = []
        for i, (kp, leaf) in enumerate(flat[0]):
            if leaf.ndim >= 1 and float(jnp.abs(leaf).max()) == 0.0:
                leaf = 0.05 * jax.random.normal(
                    jax.random.PRNGKey(1000 + i), leaf.shape, leaf.dtype
                )
            leaves.append(leaf)
        return jax.tree_util.tree_unflatten(flat[1], leaves)

    params["unet"] = perturb(params["unet"])
    return model, params
