from vaeunet_tpu.analysis.analyze import analyze_model
from vaeunet_tpu.analysis import plots

__all__ = ["analyze_model", "plots"]
