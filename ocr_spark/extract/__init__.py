from .heuristic import HeuristicExtractor

__all__ = ["HeuristicExtractor"]
