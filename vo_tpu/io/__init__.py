from . import kitti, synthetic
