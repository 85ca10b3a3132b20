from riptrm_tpu.ops import basis, conjres, kkt, tcg, trs  # noqa: F401
