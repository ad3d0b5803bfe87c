"""Host-side utilities: visualization, reporting, dataset analysis."""
