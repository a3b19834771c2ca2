from . import mesh, ransac_sharded
