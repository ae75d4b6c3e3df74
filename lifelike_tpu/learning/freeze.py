"""Frozen-subtree loading and gradient masking: the stage hand-off mechanism.

The reference freezes lower levels by variable-scope naming — EPMC declares
its LLC under scope 'freeze' so PMC checkpoint weights load by name and are
excluded from the optimizer (reference epmc_net.py:166-174,
epmc_net_data.py:54). The functional analog: copy a param subtree from the
donor checkpoint into the student's pytree (load_subtree), and mask its
gradients to zero in optax (frozen_optimizer) so the optimizer never touches
it — exact equivalent, no name magic.
"""
from typing import Sequence

import jax
import optax


def load_subtree(params, donor_params, paths: Sequence[Sequence[str]]):
    """Copy subtrees (e.g. [('params', 'llc')]) from donor into params."""
    params = jax.tree_util.tree_map(lambda x: x, params)  # shallow copy

    def set_path(tree, path, value):
        d = tree
        for k in path[:-1]:
            d = d[k]
        d[path[-1]] = value

    import copy

    params = copy.deepcopy(jax.device_get(params))
    for path in paths:
        src = donor_params
        for k in path:
            src = src[k]
        set_path(params, path, copy.deepcopy(jax.device_get(src)))
    return params


def freeze_labels(params, frozen_prefixes: Sequence[Sequence[str]]):
    """Label pytree for optax.multi_transform: 'frozen' under any prefix,
    'train' elsewhere."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def label_of(path):
        keys = tuple(getattr(p, "key", getattr(p, "idx", None)) for p in path)
        for pre in frozen_prefixes:
            if keys[: len(pre)] == tuple(pre):
                return "frozen"
        return "train"

    labels = jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(params), [label_of(p) for p, _ in flat]
    )
    return labels


def frozen_optimizer(base_tx, params, frozen_prefixes):
    """Optax transform that applies base_tx to trainable leaves and zeros
    updates for frozen subtrees."""
    labels = freeze_labels(params, frozen_prefixes)
    return optax.multi_transform(
        {"train": base_tx, "frozen": optax.set_to_zero()}, labels
    )
