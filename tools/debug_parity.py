"""Bisect torch-reference vs flax flagship parity by comparing
intermediate activations with transferred weights."""
from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

import numpy as np


def main():
    import torch
    import jax
    import jax.numpy as jnp
    import flax

    import reference_torch as rt
    from test_torch_parity import build_reference, convert_state_dict, flax_flat
    from mlagg_unet_tpu.models.mlla_uper import MLLAUper

    jax.config.update("jax_platforms", "cpu")
    net = build_reference()
    converted = convert_state_dict(net.state_dict())

    model = MLLAUper(out_channels=4, deep_supervision=True)
    x_np = np.random.RandomState(0).randn(1, 64, 64, 1).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x_np))["params"]
    params = flax.core.unfreeze(params)
    for path, val in converted.items():
        node = params
        for p in path[:-1]:
            node = node[p]
        node[path[-1]] = jnp.asarray(val)

    # ---- torch side: grab intermediates with hooks
    acts = {}

    def hook(name):
        def fn(mod, inp, out):
            # copy: the reference mutates/deletes list elements in-place
            if isinstance(out, list):
                acts[name] = [o.detach().clone() for o in out]
            else:
                acts[name] = out.detach().clone() if hasattr(out, "detach") else out
        return fn

    net.mlla.patch_embed.register_forward_hook(hook("patch_embed"))
    net.mlla.register_forward_hook(hook("mlla"))
    net.mambaskip.register_forward_hook(hook("mambaskip"))
    for i in range(4):
        net.mlla.layers[i].register_forward_hook(hook(f"layer{i}"))
        net.mlla.layers[i].blocks[0].register_forward_hook(hook(f"layer{i}b0"))
    net.mambaskip.blocks[0].ln_1.register_forward_hook(hook("ms_ln1"))
    net.mambaskip.blocks[0].self_attention.register_forward_hook(hook("ms_ss2d"))
    net.up_2.register_forward_hook(hook("up_2"))
    net.dec_block_2.register_forward_hook(hook("dec_block_2"))
    net.up_1.register_forward_hook(hook("up_1"))
    net.dec_block_1.register_forward_hook(hook("dec_block_1"))
    net.up_0.register_forward_hook(hook("up_0"))
    net.dec_block_0.register_forward_hook(hook("dec_block_0"))
    net.encoder0.register_forward_hook(hook("encoder0"))
    net.decoder0.register_forward_hook(hook("decoder0"))

    with torch.no_grad():
        ref_outs = net(torch.from_numpy(np.transpose(x_np, (0, 3, 1, 2))))

    # ---- flax side: capture intermediates
    outs, state = model.apply(
        {"params": params}, jnp.asarray(x_np),
        capture_intermediates=True, mutable=["intermediates"])
    inter = state["intermediates"]

    def get(path):
        node = inter
        for p in path.split("/"):
            node = node[p]
        return node["__call__"][0]

    def cmp(name, flax_val, torch_val, tohwc=True):
        t = torch_val.detach().numpy() if hasattr(torch_val, "detach") \
            else torch_val
        if tohwc and t.ndim == 4:
            t = np.transpose(t, (0, 2, 3, 1))
        f = np.asarray(flax_val, np.float32)
        if f.shape != t.shape:
            print(f"{name}: SHAPE {f.shape} vs {t.shape}")
            return
        rel = np.abs(f - t).max() / (np.abs(t).max() + 1e-8)
        print(f"{name}: rel {rel:.2e}  (ref absmax {np.abs(t).max():.3f})")

    # patch embed
    cmp("patch_embed", get("mlla/patch_embed"), acts["patch_embed"])
    # encoder outputs: flax mlla returns list; torch returns list of 5
    mlla_f = get("mlla")
    mlla_t = acts["mlla"]
    for i in range(5):
        # torch hidden states are NCHW
        cmp(f"mlla_out[{i}]", mlla_f[i], mlla_t[i])
    ms_f = get("mambaskip")
    for i in range(4):
        cmp(f"mambaskip[{i}]", ms_f[i], acts["mambaskip"][i])
    cmp("up_2", get("up_2"), acts["up_2"])
    cmp("dec_block_2_1", get("dec_block_2_1"), acts["dec_block_2"])
    cmp("up_1", get("up_1"), acts["up_1"])
    cmp("dec_block_1_1", get("dec_block_1_1"), acts["dec_block_1"])
    cmp("up_0", get("up_0"), acts["up_0"])
    cmp("dec_block_0_1", get("dec_block_0_1"), acts["dec_block_0"])
    cmp("encoder0", get("encoder0"), acts["encoder0"])
    cmp("decoder0", get("decoder0"), acts["decoder0"])
    for i, (mine, ref) in enumerate(zip(outs, ref_outs)):
        cmp(f"out[{i}]", mine, ref)


if __name__ == "__main__":
    main()
