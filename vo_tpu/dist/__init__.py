from . import ba_sharded, frontend_batch, mesh, pose_graph_sharded, ransac_sharded
