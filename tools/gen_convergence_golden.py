"""Generate the training-dynamics convergence golden from the REFERENCE
torch flagship (run once; the band lands in tests/goldens/).

Trains the reference MLLA_Uper (nnUNetTrainer_MLAgg_2D_dt_MS.py:1183) at a
tiny configuration on the shared synthetic blob task
(tests/convergence_task.py) with the reference recipe — AdamW(5e-4,
wd 3e-5, eps 1e-4), cosine warmup LR stepped per epoch, grad-clip 12,
DC+CE deep-supervision loss (compound_losses.py:8, deep_supervision.py:4,
flagship fixed 5 DS scales trainer :101-104) — and records the final
online pseudo-dice + loss trajectory. tests/test_convergence_golden.py
then trains OUR trainer from the identical (converted) init on the
identical batches and asserts the final pseudo-dice lands in this band.

Usage: python tools/gen_convergence_golden.py
"""
from __future__ import annotations

import json
import pathlib
import sys
import time

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

import convergence_task as task  # noqa: E402
import reference_torch as rt  # noqa: E402


def dc_and_ce_loss_torch(logits, target, batch_dice, smooth):
    """Mirror of our losses.dc_and_ce_loss (== reference DC_and_CE_loss,
    do_bg=False, weights 1:1) in torch. logits (B,C,h,w), target (B,h,w)."""
    import torch
    import torch.nn.functional as F

    ce = F.cross_entropy(logits, target)
    n_cls = logits.shape[1]
    probs = torch.softmax(logits.float(), dim=1)[:, 1:]
    onehot = F.one_hot(target, n_cls).permute(0, 3, 1, 2).float()[:, 1:]
    dims = (0, 2, 3) if batch_dice else (2, 3)
    intersect = (probs * onehot).sum(dims)
    sum_pred = probs.sum(dims)
    sum_gt = onehot.sum(dims)
    dc = (2.0 * intersect + smooth) / (sum_gt + sum_pred + smooth).clamp(
        min=1e-8)
    return ce - dc.mean()


def main():
    import torch

    c = task.CONFIG
    _, fl = rt.load_reference_modules()
    torch.manual_seed(c["seed_init"])
    net = fl.MLLA_Uper(
        img_size=c["size"], patch_size=2, in_channels=1,
        out_channels=c["n_classes"], embed_dim=c["embed_dim"],
        depths=c["depths"], num_heads=c["num_heads"],
        mlp_ratio=c["mlp_ratio"], qkv_bias=True, drop_rate=0.0,
        attn_drop_rate=0.0, dropout_path_rate=c["drop_path"],
        sr_ratio=list(c["sr_ratio"]), deep_supervision=True)

    opt = torch.optim.AdamW(net.parameters(), lr=c["initial_lr"],
                            eps=c["adam_eps"],
                            weight_decay=c["weight_decay"])
    train_batches, val_batches = task.make_batches()

    def to_torch(b):
        data, seg = b
        return (torch.from_numpy(np.transpose(data, (0, 3, 1, 2))),
                torch.from_numpy(seg))

    def ds_loss(outputs, target):
        total = 0.0
        for w, out in zip(task.DS_WEIGHTS, outputs):
            stride = target.shape[-1] // out.shape[-1]
            tgt = target[:, ::stride, ::stride]
            total = total + w * dc_and_ce_loss_torch(
                out, tgt, c["batch_dice"], c["smooth"])
        return total

    epoch_losses = []
    t0 = time.time()
    for epoch in range(c["epochs"]):
        lr = task.lr_at_epoch(epoch)
        for g in opt.param_groups:
            g["lr"] = lr
        losses = []
        net.train()
        for it in range(c["iters_per_epoch"]):
            data, seg = to_torch(
                train_batches[epoch * c["iters_per_epoch"] + it])
            opt.zero_grad()
            outputs = net(data)
            loss = ds_loss(outputs, seg)
            loss.backward()
            torch.nn.utils.clip_grad_norm_(net.parameters(), c["grad_clip"])
            opt.step()
            losses.append(float(loss))
        epoch_losses.append(float(np.mean(losses)))
        print(f"epoch {epoch}: lr {lr:.2e} loss {epoch_losses[-1]:.4f} "
              f"({time.time() - t0:.0f}s)", flush=True)

    # final online pseudo-dice on the fixed val batches (reference
    # nnUNetTrainer.py:895-941 semantics: accumulated hard tp/fp/fn)
    net.eval()
    n_fg = c["n_classes"] - 1
    tp = np.zeros(n_fg)
    fp = np.zeros(n_fg)
    fn = np.zeros(n_fg)
    with torch.no_grad():
        for b in val_batches:
            data, seg = to_torch(b)
            out = net(data)[0]
            pred = out.argmax(1).numpy()
            segn = seg.numpy()
            for cls in range(1, c["n_classes"]):
                p = pred == cls
                t = segn == cls
                tp[cls - 1] += np.sum(p & t)
                fp[cls - 1] += np.sum(p & ~t)
                fn[cls - 1] += np.sum(~p & t)
    dice = task.pseudo_dice(tp, fp, fn)
    golden = {
        "generator": "tools/gen_convergence_golden.py",
        "torch_version": torch.__version__,
        "config": {k: (list(v) if isinstance(v, tuple) else v)
                   for k, v in c.items()},
        "final_dice_per_class": dice,
        "final_mean_fg_dice": float(np.mean(dice)),
        "first_epoch_loss": epoch_losses[0],
        "final_epoch_loss": epoch_losses[-1],
        "epoch_losses": epoch_losses,
    }
    out_dir = REPO / "tests" / "goldens"
    out_dir.mkdir(exist_ok=True)
    out_path = out_dir / "convergence_golden.json"
    out_path.write_text(json.dumps(golden, indent=2))
    print(f"wrote {out_path}: mean fg dice {golden['final_mean_fg_dice']:.4f}")


if __name__ == "__main__":
    main()
