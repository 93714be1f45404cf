from xfmamba_tpu.ops.selective_scan import (
    selective_scan,
    selective_scan_seq,
    selective_scan_torch_layout,
)
from xfmamba_tpu.ops.cross_scan import (
    cross_scan,
    cross_merge,
    directional_scan_2d,
)
from xfmamba_tpu.ops.layer_norm import (
    layer_norm_fn,
    layer_norm_linear_fn,
    rms_norm_fn,
)
