from . import pyramid, sift, match, track
