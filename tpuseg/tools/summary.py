"""Model summary — the torchsummary.summary equivalent the reference
prints at train start (`/root/reference/model/modelUnet.py:841`): a
per-module parameter table and totals from a flax params pytree.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import numpy as np


def param_count(params) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(params))


def summarize(params, max_depth: int = 2) -> str:
    """Render a parameter table grouped to `max_depth` module levels."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    groups: Dict[str, int] = {}
    for path, leaf in flat:
        keys = [getattr(p, "key", str(p)) for p in path]
        if keys and keys[0] == "params":
            keys = keys[1:]
        group = "/".join(keys[:max_depth]) or "(root)"
        groups[group] = groups.get(group, 0) + int(np.prod(leaf.shape))
    total = sum(groups.values())
    width = max((len(g) for g in groups), default=10)
    lines = [f"{'module':<{width}}  params"]
    lines += [f"{g:<{width}}  {n:,}" for g, n in sorted(groups.items())]
    lines.append("-" * (width + 10))
    lines.append(f"{'TOTAL':<{width}}  {total:,}")
    return "\n".join(lines)


def print_summary(params, name: str = "model", max_depth: int = 2) -> int:
    total = param_count(params)
    print(f"[tpuseg] {name}: {total:,} trainable parameters")
    print(summarize(params, max_depth))
    return total
