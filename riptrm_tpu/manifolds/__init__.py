from riptrm_tpu.manifolds.base import Manifold, skew, sym
from riptrm_tpu.manifolds.euclidean import Euclidean, SkewSymmetric, Symmetric
from riptrm_tpu.manifolds.grassmann import Grassmann
from riptrm_tpu.manifolds.product import Product
from riptrm_tpu.manifolds.spd import SymmetricPositiveDefinite
from riptrm_tpu.manifolds.sphere import Sphere

__all__ = [
    "Manifold",
    "Euclidean",
    "SkewSymmetric",
    "Symmetric",
    "Grassmann",
    "Product",
    "SymmetricPositiveDefinite",
    "Sphere",
    "skew",
    "sym",
]
