#!/usr/bin/env python
"""Serial quality-sweep driver for the dense-ring protocol (VERDICT r2 #1).

Pops arm definitions from a JSONL queue file (so new arms can be appended
while the sweep runs), trains each on the dense procedural scene, evaluates
the held-out test split through the full prediction-driven eval path
(reference eval protocol: 2-level trace, chunk 16384 — run.sh:103-118
analog), and appends results to sweep_results.jsonl.

Queue entry: {"name": str, "train_flags": [..extra flags..],
              "eval_flags": [...], "epochs": int (default 12)}
Usage: python tools/sweep_quality.py --queue sweeps/queue.jsonl
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DATA_FLAGS = [
    "--dataset_name", "blender", "--root_dir", "scenes/dense96",
    "--img_wh", "320", "240", "--near", "0.05", "--far", "12.0",
    "--bound", "6", "--scale_factor", "1",
]
MODEL_FLAGS = [
    "--model_type", "nerf_tpu", "--predict_normal", "--predict_mirror_mask",
    "--trace_secondary_rays",
]
TRAIN_FLAGS = [
    "--N_importance", "64", "--noise_std", "1", "--batch_size", "1024",
    "--optimizer", "adam", "--lr", "5e-4", "--lr_scheduler", "steplr",
    "--decay_gamma", "0.5", "--chunk", "8192", "--train_geometry_stage",
    "--use_plane_consistent_loss", "--only_trace_rays_in_mirrors",
    "--val_idx", "0",
    # novel-ray regularization: the round-2 recipe that removed the fog
    # floater (STATUS.md round-2 quality evidence)
    "--novel_ray_batch", "512", "--novel_pose_jitter", "0.2",
    "--novel_ray_loss_weight", "3e-3", "--novel_ray_start_epoch", "4",
]
EVAL_FLAGS = [
    "--N_importance", "64", "--chunk", "16384", "--split", "test",
    "--max_recursive_level", "2",
]


def run_with_watchdog(cmd, log_path: str, hang_window_s: int = 900,
                      min_cpu_s: float = 5.0, retries: int = 2):
    """Run `cmd` streaming output to `log_path`, killing + retrying if the
    process makes no CPU progress for `hang_window_s`.

    The axon TPU tunnel client can deadlock on attach (observed round 5:
    main thread parks in futex_do_wait with ~3s of CPU forever; the chip
    itself stays free). Server-side XLA compiles legitimately leave the
    client at low CPU for minutes, so the window is generous. A killed
    training arm resumes from its last per-epoch checkpoint on retry
    (find_resume_ckpt), so a false positive costs at most one epoch +
    cached compiles.

    Returns a CompletedProcess-alike with .returncode.
    """
    for attempt in range(retries + 1):
        with open(log_path, "ab") as lf:
            lf.write(f"\n[watchdog] attempt {attempt}: "
                     f"{' '.join(cmd)}\n".encode())
            lf.flush()
            proc = subprocess.Popen(cmd, cwd=REPO, stdout=lf, stderr=lf)
            last_cpu, last_progress_t = 0.0, time.time()
            while True:
                try:
                    rc = proc.wait(timeout=30)
                    break
                except subprocess.TimeoutExpired:
                    pass
                try:
                    with open(f"/proc/{proc.pid}/stat") as sf:
                        parts = sf.read().rsplit(")", 1)[1].split()
                    cpu = (int(parts[11]) + int(parts[12])) / os.sysconf(
                        "SC_CLK_TCK")
                except (OSError, IndexError, ValueError):
                    continue
                if cpu - last_cpu >= min_cpu_s:
                    last_cpu, last_progress_t = cpu, time.time()
                elif time.time() - last_progress_t > hang_window_s:
                    print(f"[watchdog] no CPU progress for {hang_window_s}s "
                          f"(cpu={cpu:.0f}s); killing pid {proc.pid} "
                          f"(attempt {attempt})", flush=True)
                    proc.kill()
                    proc.wait()
                    rc = None
                    break
            if rc is not None:
                class R:
                    returncode = rc
                return R()
    class R:
        returncode = -9
    return R()


def find_resume_ckpt(name: str, epochs: int):
    """Latest per-epoch checkpoint of a previously interrupted run of this
    arm, if any (VERDICT r4 #7: environment resets kept killing arms that
    then restarted from scratch). Returns (ckpt_path, next_epoch) or
    (None, 0). A completed run (next_epoch >= epochs) returns its own
    last.ckpt so the driver can skip straight to eval."""
    best = (None, 0)
    for run in sorted(glob.glob(os.path.join(REPO, "logs", f"*sweep_{name}"))):
        for ck in glob.glob(os.path.join(run, "epoch=*.ckpt.npz")):
            ep = int(os.path.basename(ck).split("=")[1].split(".")[0])
            if ep + 1 > best[1]:
                best = (ck, ep + 1)
    return best


def run_arm(arm: dict, results_path: str) -> None:
    name = arm["name"]
    epochs = int(arm.get("epochs", 12))
    decay = arm.get("decay_step", ["4", "8", "12"])
    # Per-arm overrides (paper-protocol runs use a different scene/model):
    # "data_flags"/"model_flags" replace the dense-ring defaults wholesale.
    data_flags = [str(f) for f in arm.get("data_flags", DATA_FLAGS)]
    model_flags = [str(f) for f in arm.get("model_flags", MODEL_FLAGS)]
    base_train = [str(f) for f in arm.get("base_train_flags", TRAIN_FLAGS)]
    log_path = os.path.join(REPO, "sweeps", f"arm_{name}.log")
    t0 = time.time()
    rc = 0
    for attempt in range(3):
        resume_ckpt, resume_epoch = find_resume_ckpt(name, epochs)
        if resume_ckpt is not None and resume_epoch >= epochs:
            print(f"[sweep] {name} already trained to epoch {resume_epoch}; "
                  "skipping train", flush=True)
            rc = 0
            break
        resume_flags = (["--ckpt_path", resume_ckpt]
                        if resume_ckpt is not None else [])
        if resume_flags:
            print(f"[sweep] RESUME {name} from epoch {resume_epoch} "
                  f"({resume_ckpt})", flush=True)
        train_cmd = (
            [sys.executable, "train.py"] + data_flags + model_flags
            + base_train
            + ["--num_epochs", str(epochs), "--decay_step"]
            + [str(d) for d in decay]
            + [str(f) for f in arm.get("train_flags", [])] + resume_flags
            + ["--exp_name", f"sweep_{name}"])
        print(f"[sweep] TRAIN {name} (attempt {attempt}): "
              f"{' '.join(train_cmd)}", flush=True)
        rc = run_with_watchdog(train_cmd, log_path, retries=0).returncode
        if rc == 0:
            break
        print(f"[sweep] {name} attempt {attempt} exited rc={rc}; "
              "retrying with resume", flush=True)
    train_s = time.time() - t0
    if rc != 0:
        tail = ""
        try:
            with open(log_path) as lf:
                tail = lf.read()[-2000:]
        except OSError:
            pass
        rec = {"name": name, "status": "train_failed", "tail": tail}
        with open(results_path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        return
    runs = sorted(glob.glob(os.path.join(REPO, "logs", f"*sweep_{name}")))
    ckpt = os.path.join(runs[-1], "last.ckpt.npz")
    if not os.path.exists(ckpt) and resume_ckpt is not None:
        # completed-run skip path: the run that finished may not be runs[-1]
        ckpt = os.path.join(os.path.dirname(resume_ckpt), "last.ckpt.npz")
    rec = {"name": name, "status": "ok", "ckpt": ckpt,
           "train_minutes": round(train_s / 60, 1),
           "epochs": epochs, "decay": decay,
           "train_flags": arm.get("train_flags", [])}
    # eval held-out: unfused, fused, fused+proposal_skip (round-4 lever)
    for tag, extra in (("psnr_unfused", []), ("psnr_fused", ["--fused_field"]),
                       ("psnr_fused_skip",
                        ["--fused_field", "--proposal_skip"])):
        ev_cmd = (
            [sys.executable, "eval.py"] + data_flags + model_flags + EVAL_FLAGS
            + [str(f) for f in arm.get("train_flags", [])]
            + [str(f) for f in arm.get("eval_flags", [])] + extra
            + ["--ckpt_path", ckpt, "--exp_name", f"eval_sweep_{name}_{tag}"])
        ev = run_with_watchdog(ev_cmd, log_path, retries=1)
        ds_name = (data_flags[data_flags.index("--dataset_name") + 1]
                   if "--dataset_name" in data_flags else "blender")
        pj = os.path.join(REPO, "results", ds_name,
                          f"eval_sweep_{name}_{tag}", "psnr.json")
        if ev.returncode == 0 and os.path.exists(pj):
            with open(pj) as f:
                rec[tag] = json.load(f)
        else:
            tail = ""
            try:
                with open(log_path) as lf:
                    tail = lf.read()[-800:]
            except OSError:
                pass
            rec[tag] = {"error": f"rc={ev.returncode}: " + tail}
    with open(results_path, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(f"[sweep] DONE {name}: {json.dumps(rec)[:400]}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--queue", default="sweeps/queue.jsonl")
    ap.add_argument("--results", default="sweeps/results.jsonl")
    ap.add_argument("--idle_exit_s", type=int, default=900,
                    help="exit after this long with an empty queue")
    args = ap.parse_args()
    qpath = os.path.join(REPO, args.queue)
    rpath = os.path.join(REPO, args.results)
    os.makedirs(os.path.dirname(qpath), exist_ok=True)
    done_path = qpath + ".done"
    idle_since = time.time()
    while True:
        lines = []
        if os.path.exists(qpath):
            with open(qpath) as f:
                lines = [ln.strip() for ln in f if ln.strip()]
        ndone = 0
        if os.path.exists(done_path):
            with open(done_path) as f:
                ndone = sum(1 for ln in f if ln.strip())
        pending = lines[ndone:]
        if not pending:
            if time.time() - idle_since > args.idle_exit_s:
                print("[sweep] queue idle, exiting", flush=True)
                return
            time.sleep(20)
            continue
        arm = json.loads(pending[0])
        run_arm(arm, rpath)
        with open(done_path, "a") as f:
            f.write(pending[0] + "\n")
        # reset AFTER the arm: a multi-hour arm must not count as idle time
        # (observed: the driver exited the moment a 35-min arm finished)
        idle_since = time.time()


if __name__ == "__main__":
    main()
