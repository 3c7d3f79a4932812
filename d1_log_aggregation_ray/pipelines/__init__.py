from .harvest import build_pipeline, run_harvest

__all__ = ["build_pipeline", "run_harvest"]
