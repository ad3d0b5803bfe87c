"""Data subsystem: offline pipeline, host loader, on-device augmentation."""
