from . import lbs  # noqa: F401  (module; the function is lbs.lbs)
from .vitruvian import get_02v_bone_transforms  # noqa: F401
from .body_model import SMPLAssets, load_assets, synthetic_assets  # noqa: F401
