"""Crappifier approximation example (counterpart of the reference's
notebooks/approximate.ipynb): fit crappifier parameters to real pairs.

    python examples/approximate.py hr_images/ lr_images/
"""

import sys

from pssr2_tpu.bayes import Real
from pssr2_tpu.crappifiers import Poisson
from pssr2_tpu.data import PairedImageDataset
from pssr2_tpu.train import approximate_crappifier


def main(hr_path, lr_path):
    dataset = PairedImageDataset(hr_path, lr_path)

    # search intensity and gain; space mirrors the reference notebook
    space = [Real(0.5, 1.5), Real(-5, 5)]
    result = approximate_crappifier(Poisson, space, dataset, max_images=50, opt_kwargs=dict(n_calls=30))

    print("best parameters:", result.x, "objective:", result.fun)
    print("use as: Poisson(intensity=%.3f, gain=%.3f)" % tuple(result.x))


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
