"""Patch prediction stage: batched device inference + PRED_*.tif writers."""
