from .ap import waymo_style_eval, kitti_style_eval, match_frame, average_precision  # noqa: F401
