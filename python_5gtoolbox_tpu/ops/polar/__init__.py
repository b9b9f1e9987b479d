from python_5gtoolbox_tpu.ops.polar.construct import construct, gen_n_value  # noqa: F401
from python_5gtoolbox_tpu.ops.polar.interleave import (  # noqa: F401
    input_interleave_table, input_deinterleave_table)
from python_5gtoolbox_tpu.ops.polar.encode import polar_encode, polar_encode_np  # noqa: F401
from python_5gtoolbox_tpu.ops.polar.ratematch import (  # noqa: F401
    polar_ratematch, polar_raterecover, subblock_interleave_table,
    triangle_interleave_table)
from python_5gtoolbox_tpu.ops.polar.decode import polar_decode_scl  # noqa: F401
