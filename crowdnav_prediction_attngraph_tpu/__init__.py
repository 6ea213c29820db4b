"""TPU-native crowd-navigation RL framework (CrowdNav++ capabilities).

Brand-new JAX/XLA/Pallas implementation of the capabilities of
Shuijing725/CrowdNav_Prediction_AttnGraph — see SURVEY.md for the blueprint.
"""

import os as _os

import jax as _jax

# Persistent XLA compilation cache: the fused train/eval programs take
# minutes to compile on the remote TPU compiler; cache them across runs.
_jax.config.update(
    "jax_compilation_cache_dir",
    _os.environ.get("CROWDNAV_TPU_JAX_CACHE",
                    _os.path.join(_os.path.dirname(_os.path.dirname(
                        _os.path.abspath(__file__))), ".jax_cache")))
_jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
