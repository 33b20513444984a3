"""Dump the optimized HLO of the bench 5-fold inference program and print
the instruction mix of the named fusions the profiler flagged
(scripts/probe_infer_profile.py): what are fusion.11 / fusion.34 /
compare_select_fusion.3 / convolution_add_fusion actually computing?

Usage: PYTHONPATH=/root/repo python scripts/probe_infer_hlo.py [names...]
"""
from __future__ import annotations

import re
import sys

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from freesound_classification_tpu.models.classifiers import TwoDimensionalCNN
from freesound_classification_tpu.models.frontend import Frontend

SR = 44100
N_CLASSES = 80
N_FOLDS = 5
FEATURES = "mel_2048_1024_128"


def main():
    names = sys.argv[1:] or [
        "compare_select_fusion.3", "convolution_add_fusion", "fusion.11",
        "fusion.34", "convolution_add_fusion.1", "fusion.259",
        "compare_select_fusion.12", "fusion.78", "compare_select_fusion.16",
        "fusion.81",
    ]
    b, l = 64, SR * 10
    model = TwoDimensionalCNN(
        num_conv_blocks=6, start_deep_supervision_on=2, conv_base_depth=64,
        growth_rate=1.5, aggregation_type="max", n_classes=N_CLASSES,
        dtype=jnp.bfloat16, fused_infer=False)
    frontend = Frontend(FEATURES, "2d", sr=SR, use_pallas=True,
                        dft_precision="default")

    rng = np.random.RandomState(0)
    wave = jnp.asarray(rng.randn(b, l).astype(np.float32) * 0.1)
    lengths = jnp.full((b,), l, jnp.int32)
    inputs, fl = frontend(wave, lengths)
    variables = model.init({"params": jax.random.PRNGKey(0)}, inputs, fl,
                           train=False)
    stacked = jax.tree.map(
        lambda leaf: (jnp.broadcast_to(leaf, (N_FOLDS,) + leaf.shape)
                      if hasattr(leaf, "shape") else leaf), variables)

    def infer_5fold(wave, lengths):
        x, f = frontend(wave, lengths)

        def one_fold(v):
            return model.apply(v, x, f, train=False)["class_logits"]

        logits = jax.vmap(one_fold)(stacked)
        return jnp.mean(jax.nn.sigmoid(logits), axis=0)

    txt = jax.jit(infer_5fold).lower(wave, lengths).compile().as_text()
    with open("/tmp/infer_5fold_hlo.txt", "w") as f:
        f.write(txt)
    print(f"HLO: {len(txt.splitlines())} lines -> /tmp/infer_5fold_hlo.txt")

    # index fusion computations: name -> called computation body
    # optimized HLO: `%name = ... fusion(...), kind=kXXX, calls=%comp`
    calls = {}
    for m in re.finditer(r"%?([\w.\-]+)\s*=\s*\S+\s+fusion\([^\n]*calls=%?"
                         r"([\w.\-]+)", txt):
        calls[m.group(1)] = m.group(2)
    comps = {}
    cur = None
    for line in txt.splitlines():
        m = re.match(r"%?([\w.\-]+)\s+\([^)]*\)\s*->\s*.*\{", line)
        if m:
            cur = m.group(1)
            comps[cur] = []
        elif cur is not None:
            if line.strip() == "}":
                cur = None
            else:
                comps[cur].append(line.rstrip())

    for name in names:
        print("\n" + "=" * 78)
        # the definition line itself (shows output shape + operands)
        for line in txt.splitlines():
            if re.match(rf"\s*(ROOT )?%?{re.escape(name)}\s*=", line):
                print(line.strip()[:400])
                break
        comp = calls.get(name)
        if comp and comp in comps:
            body = comps[comp]
            kinds = {}
            for ln in body:
                m = re.search(r"=\s*\S+\s+([\w\-]+)\(", ln)
                if m:
                    kinds[m.group(1)] = kinds.get(m.group(1), 0) + 1
            print(f"  calls {comp}: {len(body)} instrs, mix {kinds}")
            for ln in body[:12]:
                print("   ", ln.strip()[:200])
            if len(body) > 12:
                print(f"    ... {len(body)-12} more")


if __name__ == "__main__":
    main()
