"""Sensor capture layer: file/stream camera drivers + lidar decoding."""
from rtabmap_tpu.sensors.capture import (  # noqa: F401
    CameraDriver, CameraImages, CameraRGBDImages, CameraStereoImages,
    CameraVideo, DBCamera, available_drivers, create_camera,
)
