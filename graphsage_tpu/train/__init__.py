"""Training loops, CLI flag surface, metrics, checkpointing.

Importing this package enables JAX's persistent compile cache (set
GRAPHSAGE_COMPILE_CACHE="" to disable): first compiles of the chunked
train runners cost 1-3 minutes on remoted TPUs and are fully cacheable.
"""

import os as _os

_cache = _os.environ.get(
    "GRAPHSAGE_COMPILE_CACHE",
    _os.path.expanduser("~/.cache/graphsage_tpu_jax"),
)
if _cache:
    import jax as _jax

    _jax.config.update("jax_compilation_cache_dir", _cache)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
