from . import se3, camera, triangulate
from .camera import StereoCalib
