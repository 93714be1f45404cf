from xfmamba_tpu.checkpoint.convert import (
    convert_vssm_state_dict,
    convert_xfmamba_state_dict,
    load_pth_state_dict,
)
