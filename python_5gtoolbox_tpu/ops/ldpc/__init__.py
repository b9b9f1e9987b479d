from python_5gtoolbox_tpu.ops.ldpc.tables import (  # noqa: F401
    CBInfo, base_graph, find_ils, get_cbs_info, shift_table, ZLIST,
)
from python_5gtoolbox_tpu.ops.ldpc.encode import ldpc_encode, ldpc_encode_np  # noqa: F401
from python_5gtoolbox_tpu.ops.ldpc.ratematch import (  # noqa: F401
    get_er_ldpc, get_k0, ratematch_indices, ldpc_ratematch, ldpc_raterecover,
)
from python_5gtoolbox_tpu.ops.ldpc.segment import cb_segment_np  # noqa: F401
from python_5gtoolbox_tpu.ops.ldpc.decode import ldpc_decode, ldpc_decode_bf  # noqa: F401
