"""Post-hoc evaluation: confusion-matrix metrics over prediction files."""
