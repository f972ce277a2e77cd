from . import calendar, metrics, scalar

__all__ = ["calendar", "metrics", "scalar"]
