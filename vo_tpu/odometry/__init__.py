from . import landmarks, pipeline, runner
