from .boosted_hybrid import BoostedHybrid, BoostedHybridModel
from .encoders import build_feature_pipeline
from .mlp import MLPRegressor, MLPRegressorModel
from .stacking import StackingModel, oof_stack
from .tps import run_tps_pipeline, synthetic_sales

__all__ = [
    "BoostedHybrid",
    "BoostedHybridModel",
    "MLPRegressor",
    "MLPRegressorModel",
    "StackingModel",
    "build_feature_pipeline",
    "oof_stack",
    "run_tps_pipeline",
    "synthetic_sales",
]
