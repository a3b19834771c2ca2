from . import pose_graph, window
