from ifctordf_ray.functions.kernels import (  # noqa: F401
    cents,
    md5_hex,
    stable_hash64,
    str_concat,
    ts_lexical,
)
