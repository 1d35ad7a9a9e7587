"""Optimizers and schedulers with torch-like stateful semantics over optax.

The reference wires AdamW + ExponentialLR / ReduceLROnPlateau
(reference: pssr/__main__.py:120-123, pssr/train.py:77,160-164).  Here the
optimizer is an optax transformation with an injected learning-rate
hyperparameter; scheduler objects mutate the host-side ``lr`` which is fed
to the jitted train step as a device scalar each step (no recompilation).
"""

import optax


class AdamW:
    """AdamW with torch-default hyperparameters
    (lr=1e-3, betas=(0.9, 0.999), eps=1e-8, weight_decay=1e-2)."""

    def __init__(self, lr: float = 1e-3, betas=(0.9, 0.999), eps: float = 1e-8, weight_decay: float = 1e-2):
        self.lr = float(lr)
        self.tx = optax.inject_hyperparams(optax.adamw)(
            learning_rate=self.lr, b1=betas[0], b2=betas[1], eps=eps, weight_decay=weight_decay
        )

    def init(self, params):
        return self.tx.init(params)


class SGD:
    def __init__(self, lr: float = 1e-3, momentum: float = 0.0):
        self.lr = float(lr)
        self.tx = optax.inject_hyperparams(optax.sgd)(learning_rate=self.lr, momentum=momentum)

    def init(self, params):
        return self.tx.init(params)


class ExponentialLR:
    """Multiply lr by gamma each epoch (torch ExponentialLR parity)."""

    def __init__(self, optim, gamma: float, verbose: bool = False):
        self.optim = optim
        self.gamma = gamma
        self.verbose = verbose

    def step(self):
        self.optim.lr *= self.gamma
        if self.verbose:
            print(f"Adjusting learning rate to {self.optim.lr:.4e}.")


class ReduceLROnPlateau:
    """Reduce lr when a metric stops improving (torch parity: mode='min',
    factor, patience, threshold as relative improvement)."""

    def __init__(self, optim, mode: str = "min", factor: float = 0.1, patience: int = 10, threshold: float = 1e-4, min_lr: float = 0.0, verbose: bool = False):
        assert mode in ("min", "max")
        self.optim = optim
        self.mode = mode
        self.factor = factor
        self.patience = patience
        self.threshold = threshold
        self.min_lr = min_lr
        self.verbose = verbose
        self.best = None
        self.num_bad = 0

    def _is_better(self, metric):
        if self.best is None:
            return True
        if self.mode == "min":
            return metric < self.best * (1 - self.threshold)
        return metric > self.best * (1 + self.threshold)

    def step(self, metric):
        if self._is_better(metric):
            self.best = metric
            self.num_bad = 0
        else:
            self.num_bad += 1
        if self.num_bad > self.patience:
            self.optim.lr = max(self.optim.lr * self.factor, self.min_lr)
            self.num_bad = 0
            if self.verbose:
                print(f"Reducing learning rate to {self.optim.lr:.4e}.")
