from .ap import waymo_style_eval, kitti_style_eval, match_frame, average_precision  # noqa: F401
from .waymo_official import official_available, waymo_official_eval  # noqa: F401
