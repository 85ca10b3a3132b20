from riptrm_tpu.solvers.base import Output, merge_options
from riptrm_tpu.solvers.ralm import RALM
from riptrm_tpu.solvers.ripm import RIPM
from riptrm_tpu.solvers.riptrm import RIPTRM
from riptrm_tpu.solvers.rsqo import RSQO

__all__ = ["Output", "merge_options", "RALM", "RIPM", "RIPTRM", "RSQO"]
