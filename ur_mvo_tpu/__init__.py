"""ur_mvo_tpu — a TPU-native visual-odometry framework.

Re-implements the full capability surface of UR-MVO (underwater robust
monocular/stereo/RGB-D VO with SuperPoint features, SuperGlue matching,
and sliding-window bundle adjustment) as a JAX/XLA/Pallas framework
designed for TPU from the ground up. See DESIGN.md.
"""

__version__ = "0.1.0"

from ur_mvo_tpu.config import Configs, SensorSetup

__all__ = ["Configs", "SensorSetup", "__version__"]
