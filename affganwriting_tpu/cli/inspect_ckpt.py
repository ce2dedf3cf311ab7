"""Inspect a checkpoint: param counts, shapes, config (seemodel.py).

    python -m affganwriting_tpu.cli.inspect_ckpt <ckpt_dir> [--name latest]
"""

from __future__ import annotations

import argparse
import json


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("ckpt_dir")
    p.add_argument("--name", default="latest")
    p.add_argument("--shapes", action="store_true",
                   help="print every parameter shape")
    args = p.parse_args(argv)

    import jax

    from affganwriting_tpu.core.checkpoint import CheckpointManager
    from affganwriting_tpu.train.state import init_state, param_count

    ck = CheckpointManager(args.ckpt_dir)
    config = ck.load_config(args.name)
    print(config.to_json())
    state = init_state(config, jax.random.key(0))
    state = ck.restore(args.name, state)
    print(json.dumps({"step": int(state.step),
                      "param_counts": param_count(state)}, indent=2))
    if args.shapes:
        for player in ("gen", "dis", "cla", "rec"):
            tree = getattr(state, player).params
            for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
                name = "/".join(str(getattr(k, "key", k)) for k in path)
                print(f"{player}/{name}: {leaf.shape} {leaf.dtype}")


if __name__ == "__main__":
    main()
