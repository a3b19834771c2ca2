from . import loop_closure
