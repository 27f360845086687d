"""Reference-scale emulator training measurement (VERDICT r4 item 3).

Reruns the thesis's actual deliverable at its own scale — 200 train/val
volumes of 32^3, 1000 epochs, batch 16, lr 4e-3, MC-dropout UQ with 50
stochastic passes (`Cosmo NN5.py:416-461` + `Feeder_pipe.py:20-22`;
reference CPU walls 1208-3893 s) — through the device-resident scanned
fit loop, and prints ONE JSON line with walls + accuracy metrics.

Round-1 baseline (host-dispatch-bound loop): 822 s on chip.
Usage: python scripts/emulator_scale.py [--epochs 1000] [--out FILE]
"""

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=1000)
    ap.add_argument("--n", type=int, default=200)
    ap.add_argument("--n-test", type=int, default=100)
    ap.add_argument("--nmesh", type=int, default=32)
    ap.add_argument("--epoch-chunk", type=int, default=None)
    ap.add_argument("--host-loop", action="store_true",
                    help="measure the legacy streaming loop instead")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from nbody.driver.pipeline import A_S_CENTER, A_S_SIGMA
    from nbody.emulator.data import DeltaDataset, create_linear_dataset
    from nbody.emulator.model import CosmoCNN, max_conv_blocks
    from nbody.emulator.train import evaluate_uq, fit

    t_all = time.perf_counter()
    root = tempfile.mkdtemp(prefix="emu_scale_")
    tr_lo = A_S_CENTER - 20.0 * A_S_SIGMA
    tr_hi = A_S_CENTER + 20.0 * A_S_SIGMA
    te_lo = A_S_CENTER - 10.0 * A_S_SIGMA
    te_hi = A_S_CENTER + 10.0 * A_S_SIGMA
    t0 = time.perf_counter()
    create_linear_dataset(root, args.n, z=0.0, box=500.0, nmesh=args.nmesh,
                          A_s_min=tr_lo, A_s_max=tr_hi, val_size=0.1)
    create_linear_dataset(root, args.n_test, z=0.0, box=500.0,
                          nmesh=args.nmesh, A_s_min=te_lo, A_s_max=te_hi,
                          test=True)
    t_data = time.perf_counter() - t0

    train = DeltaDataset.from_directory(root, "train")
    val = DeltaDataset.from_directory(root, "val")
    test = DeltaDataset.from_directory(root, "test")
    model = CosmoCNN(n_out=1, n_conv=min(2, max_conv_blocks(train.dim)))

    res = fit(model, train, val, epochs=args.epochs, batch_size=16,
              lr=4e-3, seed=0, epoch_chunk=args.epoch_chunk,
              host_loop=args.host_loop)
    t0 = time.perf_counter()
    ev = evaluate_uq(model, res.params, test, n_mc=50, seed=0)
    t_eval = time.perf_counter() - t0

    out = {
        "metric": "emulator reference-scale train wall",
        "loop": "host" if args.host_loop else "scanned",
        "n_trainval": args.n, "nmesh": args.nmesh, "epochs": args.epochs,
        "epochs_run": len(res.history["train_loss"]),
        "train_wall_s": round(res.wall_s, 2),
        "data_wall_s": round(t_data, 2),
        "eval_wall_s": round(t_eval, 2),
        "total_wall_s": round(time.perf_counter() - t_all, 2),
        "best_val_loss": float(res.best_val_loss),
        "best_epoch": res.best_epoch,
        "abs_dev_percent_A_s": float(ev.abs_dev_percent[0]),
        "coverage_1_2_3_sigma": [float(c) for c in ev.coverage[0]],
        "reference_cpu_walls_s": [1208, 3893],
        "round1_chip_wall_s": 822,
    }
    line = json.dumps(out)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
