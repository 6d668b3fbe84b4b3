"""Persistent XLA compilation cache shared by the CLIs, bench, and dryrun.

Big programs (ViT-B @1024^2 train/predict) compile for minutes through the
axon tunnel and ~1-5 min on the 1-core CPU host; the on-disk cache under
``<repo>/.xla_cache`` makes every re-invocation with unchanged code free.
The reference gets this for free from torch's eager kernels; an XLA-compiled
framework has to persist compilations explicitly.
"""

from __future__ import annotations

import os


def enable_compile_cache(min_compile_secs: float = 2.0) -> None:
    """Point JAX's persistent compilation cache at ``<repo>/.xla_cache``.

    Call before the first ``jax.jit`` execution. Never raises: the cache is
    an optimization, and some backends/configs may reject it.
    """
    import jax

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        ".xla_cache",
    )
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", min_compile_secs
        )
    except Exception:
        pass
