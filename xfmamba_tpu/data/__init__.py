from xfmamba_tpu.data.loader import TwoViewLoader, TwoViewSamples
from xfmamba_tpu.data.transforms import TwoViewTransform
