"""ur_mvo_tpu — a TPU-native visual-odometry framework.

Re-implements the full capability surface of UR-MVO (underwater robust
monocular/stereo/RGB-D VO with SuperPoint features, SuperGlue matching,
and sliding-window bundle adjustment) as a JAX/XLA/Pallas framework
designed for TPU from the ground up. See DESIGN.md.
"""

__version__ = "0.1.0"

from ur_mvo_tpu.config import Configs, SensorSetup

__all__ = ["Configs", "SensorSetup", "UR_MVO", "__version__"]


def __getattr__(name):
    # Lazy: importing the engine pulls in jax; keep bare package import light.
    if name == "UR_MVO":
        from ur_mvo_tpu.engine import UR_MVO

        return UR_MVO
    raise AttributeError(f"module 'ur_mvo_tpu' has no attribute {name!r}")
