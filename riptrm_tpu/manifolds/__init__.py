from riptrm_tpu.manifolds.base import Manifold, skew, sym
from riptrm_tpu.manifolds.euclidean import Euclidean, SkewSymmetric, Symmetric
from riptrm_tpu.manifolds.fixed_rank import FixedRankEmbedded
from riptrm_tpu.manifolds.grassmann import Grassmann
from riptrm_tpu.manifolds.product import Product
from riptrm_tpu.manifolds.spd import SymmetricPositiveDefinite
from riptrm_tpu.manifolds.sphere import Sphere
from riptrm_tpu.manifolds.stiefel import Stiefel

__all__ = [
    "Manifold",
    "Euclidean",
    "SkewSymmetric",
    "Symmetric",
    "Grassmann",
    "Product",
    "SymmetricPositiveDefinite",
    "Sphere",
    "Stiefel",
    "FixedRankEmbedded",
    "skew",
    "sym",
]
