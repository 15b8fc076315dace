"""Training stack: config, optimizers, LR schedules, trainer, metrics,
generation."""
