"""Optimizer + schedulers (reference src/flair/tasks_utils.py:95-104 semantics).

SGD with a ReduceLROnPlateau-equivalent controller: plain SGD(lr) and a
host-side plateau tracker (factor 0.5, patience 10, cooldown 4, min_lr 1e-7,
torch's rel-threshold 1e-4 semantics) that scales the learning rate between
epochs — LR is an optax injected hyperparameter, so changing it does not
retrace the jitted step.

EarlyStopping mirrors Lightning's monitor/patience semantics
(reference tasks.py:58-63; patience knob configs/flair-1-config.yaml:93).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import optax


def make_optimizer(learning_rate: float) -> optax.GradientTransformation:
    return optax.inject_hyperparams(optax.sgd)(learning_rate=learning_rate)


def set_learning_rate(opt_state, lr: float):
    """Rewrite the injected LR in an inject_hyperparams state."""
    import jax.numpy as jnp

    cur = opt_state.hyperparams["learning_rate"]
    opt_state.hyperparams["learning_rate"] = jnp.asarray(
        lr, dtype=getattr(cur, "dtype", jnp.float32))
    return opt_state


@dataclass
class ReduceLROnPlateau:
    """torch.optim.lr_scheduler.ReduceLROnPlateau parity (mode='min')."""

    lr: float
    mode: str = "min"
    factor: float = 0.5
    patience: int = 10
    cooldown: int = 4
    min_lr: float = 1e-7
    threshold: float = 1e-4

    best: float = field(default=None, init=False)  # type: ignore[assignment]
    num_bad_epochs: int = field(default=0, init=False)
    cooldown_counter: int = field(default=0, init=False)

    def _is_better(self, metric: float) -> bool:
        if self.best is None:
            return True
        if self.mode == "min":
            return metric < self.best * (1 - self.threshold)
        return metric > self.best * (1 + self.threshold)

    def step(self, metric: float) -> float:
        """Feed the monitored metric (per epoch); returns the current LR."""
        if self._is_better(metric):
            self.best = metric
            self.num_bad_epochs = 0
        else:
            self.num_bad_epochs += 1
        if self.cooldown_counter > 0:
            self.cooldown_counter -= 1
            self.num_bad_epochs = 0
        if self.num_bad_epochs > self.patience:
            self.lr = max(self.lr * self.factor, self.min_lr)
            self.cooldown_counter = self.cooldown
            self.num_bad_epochs = 0
        return self.lr


@dataclass
class EarlyStopping:
    """Lightning EarlyStopping parity: stop after `patience` checks w/o improvement."""

    monitor_mode: str = "min"
    patience: int = 30
    min_delta: float = 0.0

    best: float = field(default=None, init=False)  # type: ignore[assignment]
    wait: int = field(default=0, init=False)
    stopped: bool = field(default=False, init=False)

    def step(self, metric: float) -> bool:
        """Returns True when training should stop."""
        improved = (
            self.best is None
            or (self.monitor_mode == "min" and metric < self.best - self.min_delta)
            or (self.monitor_mode == "max" and metric > self.best + self.min_delta)
        )
        if improved:
            self.best = metric
            self.wait = 0
        else:
            self.wait += 1
            if self.wait >= self.patience:
                self.stopped = True
        return self.stopped
