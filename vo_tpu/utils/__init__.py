from . import padding
