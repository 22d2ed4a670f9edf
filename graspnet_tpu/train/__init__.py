"""Training stack: loss, on-device label pipeline, trainer."""
