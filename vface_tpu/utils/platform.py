"""Platform selection helper for CLIs.

The deployment image's sitecustomize registers a tunneled-TPU PJRT plugin and
pins ``jax_platforms`` to it, overriding the ``JAX_PLATFORMS`` env var. CLIs
honour ``VFACE_PLATFORM`` (e.g. ``cpu``, ``tpu``) so smoke runs can opt out of
the accelerator without editing code.
"""

from __future__ import annotations

import os


def apply_platform_from_env() -> None:
    plat = os.environ.get("VFACE_PLATFORM")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)
