"""Persistent XLA compilation cache.

The axon TPU tunnel compiles large programs slowly (minutes for the
BigGAN-256 fwd+bwd scan); caching compiled executables on disk makes every
process after the first start in seconds. Call ``enable_compilation_cache()``
early (bench.py and __graft_entry__ do).
"""

import os

import jax

DEFAULT_CACHE_DIR = os.environ.get(
    "PIX2LATENT_TPU_CACHE", os.path.expanduser("~/.cache/pix2latent_tpu_xla"))


def enable_compilation_cache(cache_dir: str = None):
    cache_dir = cache_dir or DEFAULT_CACHE_DIR
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception as e:  # pragma: no cover - config names vary by version
        print(f"compilation cache unavailable: {e}")
    return cache_dir
