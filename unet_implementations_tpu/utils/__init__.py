"""Host-side utilities: visualization, reporting, dataset analysis,
compiled-HLO cost profiling (utils/profiling.py)."""
