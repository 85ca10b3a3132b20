from riptrm_tpu.problems.problem import Problem  # noqa: F401
