"""Did this training run complete?  Prints the checkpoint's iteration stamp.

Exit 0 iff the checkpoint in DIR proves the run reached its configured
``train_steps`` (read from the stored hyper-parameters; override with
``--steps``).  Used by the arm runner scripts to stamp ``DONE`` only on
genuinely completed runs — a SIGTERM/wall-bounded attempt exits the train
CLI cleanly (rc 0), so "the trainer returned" is NOT completion evidence
and round 4's unconditional ``touch DONE`` marked 3-step checkpoints as
finished arms (VERDICT r4 weak #2, ADVICE r4).

Completion stamps, by loop vintage:
  * round-5 loop: a final post-increment checkpoint at exactly
    ``train_steps`` (train/loop.py completion save);
  * earlier loops: the last save was the val-interval save BEFORE
    train_steps, stamped pre-increment at ``((steps-1)//interval)*interval``.
Both are accepted.  A SIGTERM checkpoint mid-run stamps post-increment at
the kill step, which lands strictly between boundaries (or below the last
one) and stays resumable.
"""

import argparse
import json
import os
import sys


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument('dir', help='training output dir (checkpoint.msgpack '
                                '+ hyper_parameters.json)')
    ap.add_argument('--steps', type=int, default=0,
                    help='override train_steps (default: stored hyper)')
    ap.add_argument('--interval', type=int, default=0,
                    help='override val_interval (default: stored hyper)')
    args = ap.parse_args()

    hyper_path = os.path.join(args.dir, 'hyper_parameters.json')
    ckpt_path = os.path.join(args.dir, 'checkpoint.msgpack')
    if not (os.path.exists(hyper_path) and os.path.exists(ckpt_path)):
        print(f'no checkpoint in {args.dir}', file=sys.stderr)
        return 1

    hyper = json.load(open(hyper_path))
    steps = args.steps or int(hyper.get('train_steps') or 0)
    interval = args.interval or int(hyper.get('val_interval') or 1)
    if steps <= 0:
        print('train_steps unbounded (0): no completion criterion',
              file=sys.stderr)
        return 1

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from mmlf_tpu.train.checkpoint import load_checkpoint_raw
    _, meta, _ = load_checkpoint_raw(args.dir)
    it = int(meta['iteration'])
    print(it)

    legacy_boundary = ((steps - 1) // max(1, interval)) * max(1, interval)
    complete = it >= steps or it == legacy_boundary
    if not complete:
        print(f'incomplete: iteration {it} < train_steps {steps} '
              f'(legacy completion boundary {legacy_boundary})',
              file=sys.stderr)
    return 0 if complete else 1


if __name__ == '__main__':
    sys.exit(main())
