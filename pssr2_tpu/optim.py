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


def lr_finder(
    model,
    dataset,
    batch_size: int,
    loss_fn,
    start_lr: float = 1e-7,
    end_lr: float = 1.0,
    n_steps: int = 50,
    weight_decay: float = 1e-2,
    seed: int = 0,
):
    """Learning-rate range test (Smith 2017): sweep lr exponentially from
    ``start_lr`` to ``end_lr`` over ``n_steps`` training steps and record the
    loss; the suggested lr is the point of steepest descent (an order of
    magnitude below the divergence point).

    Uses a throwaway copy of the model state (the caller's model is not
    modified). Returns (lrs, losses, suggested_lr).
    """
    import jax
    import numpy as np
    from flax import nnx

    from .data.indexing import RandomIterIdx, invert_idx
    from .data.pipeline import PatchLoader, make_device_gen_pair, prefetch_to_device
    from .train import _build_paired_steps, _use_device_pipeline, _PairBatchLoader

    # work on a copy so the sweep doesn't disturb the caller's weights
    graphdef, state = nnx.split(model)
    model = nnx.merge(graphdef, jax.tree.map(lambda x: x, state))
    model.train()

    optim = AdamW(lr=start_lr, weight_decay=weight_decay)
    optimizer = nnx.Optimizer(model, optim.tx, wrt=nnx.Param)

    gen_pair = None
    if _use_device_pipeline(dataset):
        base = make_device_gen_pair(dataset.lr_scale, dataset.crappifier, dataset.n_frames, augment=dataset.rotation)

        def gen_pair(key, batch, augment):
            return base(key, batch)

        loader = PatchLoader(dataset, RandomIterIdx(list(invert_idx(dataset.val_idx, len(dataset)))), batch_size)
    else:
        loader = _PairBatchLoader(dataset, RandomIterIdx(list(invert_idx(dataset.val_idx, len(dataset)))), batch_size)

    train_step, _ = _build_paired_steps(loss_fn, False, gen_pair)
    cached = nnx.cached_partial(train_step, model, optimizer)

    gamma = (end_lr / start_lr) ** (1.0 / max(n_steps - 1, 1))
    key = jax.random.key(seed)
    lrs, losses = [], []

    def batches():
        while True:
            if gen_pair is not None:
                for batch, n_valid in iter(loader):
                    yield batch, None, n_valid
            else:
                for pair, extra, n_valid in iter(loader):
                    yield pair, extra, n_valid

    lr = start_lr
    for step_idx, (batch, extra, n_valid) in zip(range(n_steps), batches()):
        key, k = jax.random.split(key)
        if gen_pair is not None:
            import jax.numpy as jnp

            batch = jnp.asarray(batch)
        loss, _, _ = cached(batch, extra, k, lr, n_valid, False)
        loss = float(loss)
        if not np.isfinite(loss) or (losses and loss > 10 * min(losses)):
            break  # diverged
        lrs.append(lr)
        losses.append(loss)
        lr *= gamma

    if len(losses) > 3:
        smooth = np.convolve(losses, np.ones(3) / 3, mode="valid")
        grad = np.gradient(smooth)
        suggested = lrs[int(np.argmin(grad)) + 1]
    else:
        suggested = start_lr
    return lrs, losses, suggested
