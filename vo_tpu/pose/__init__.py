from . import p3p, ransac
