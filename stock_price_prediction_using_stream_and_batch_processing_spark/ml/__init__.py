from .predictor import LinearWindowModel, load_model
from .inference import predict_over_windows

__all__ = ["LinearWindowModel", "load_model", "predict_over_windows"]
