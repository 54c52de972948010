from .engine import STRATEGY_WEIGHTS, SparkRecommendationEngine

__all__ = ["STRATEGY_WEIGHTS", "SparkRecommendationEngine"]
