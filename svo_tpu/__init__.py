"""svo_tpu — a TPU-native stereo visual-odometry / SLAM framework.

Built from scratch in JAX/XLA/Pallas with the capabilities of the reference C++
pipeline (ikryukov/svo): FAST/ORB feature detection with spatial bucketing,
pyramidal KLT tracking (stereo matching + temporal tracking), DLT triangulation
into a persistent map, RANSAC-PnP pose estimation with outlier rejection,
keyframe-based map maintenance — plus the windowed Schur-complement bundle
adjustment the reference declared but never implemented
(reference: src/map.cpp:84-88).

Design stance (see SURVEY.md §7): arrays + pure functions. Frame state is a
fixed-capacity struct-of-arrays; the map is preallocated arrays with a monotone
allocation cursor; every per-frame stage is a jitted function state -> state;
variable-count semantics become masks, never dynamic shapes.
"""

__version__ = "0.1.0"

import jax as _jax

# Geometry (PnP, triangulation, SE(3), BA) needs true f32 matmuls. TPU's
# default matmul precision truncates inputs to bf16, which costs pixels of
# reprojection accuracy. Image-plane kernels that can afford lower precision
# request it explicitly at their call sites.
_jax.config.update("jax_default_matmul_precision", "float32")

# Persistent compilation cache: the pipeline step is a large program and
# first-compile (especially via a remote-compile TPU tunnel) is minutes;
# caching makes every subsequent process start warm.
import os as _os

_cache_dir = _os.environ.get(
    "SVO_TPU_JAX_CACHE", _os.path.expanduser("~/.cache/svo_tpu_jax")
)
if _cache_dir:
    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from svo_tpu.config import Config, load_config  # noqa: F401
