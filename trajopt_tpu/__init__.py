"""trajopt_tpu — a TPU-native consensus-ADMM multi-robot trajectory optimizer.

Brand-new JAX/XLA/Pallas implementation of the capabilities of
ruiqini/traj-opt-admm ("Robust Multi-Robot Trajectory Optimization Using
Alternating Direction Method of Multiplier", arXiv:2111.07016): piecewise
quintic Bezier trajectories for one or many UAVs through point-cloud obstacle
fields, optimized by consensus ADMM with log-barrier separating-plane
collision constraints, velocity/acceleration limits, conservative CCD step
clamping, and co-optimized trajectory time.

Design (TPU-first, not a port):
  * the whole ADMM iteration is one jitted ``admm_step(state, scene) -> state``
  * all segment x obstacle geometry (k-DOP, GJK, plane fits, CCD) is vmapped
    dense math with fixed-K candidate tables instead of BVH traversals
  * the global Newton step is an arrowhead KKT solved by a Schur complement on
    the scalar time variable — under robot sharding this becomes one psum
  * robots and scenario batches shard over a ``jax.sharding.Mesh``
"""

from .config import TrajOptConfig

__version__ = "0.1.0"
__all__ = ["TrajOptConfig"]
