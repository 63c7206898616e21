from .trajectory import AnalysisContext, AnalysisTask, TrajectoryReader, WindowPipeline

__all__ = ["AnalysisContext", "AnalysisTask", "TrajectoryReader", "WindowPipeline"]
