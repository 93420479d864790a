from . import rosbag  # noqa: F401
