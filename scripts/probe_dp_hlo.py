"""Inspect the sharded-HLO of one DP train step (VERDICT r3 item 5): does
XLA implement the global packing sort / cumsum over the [N*C] candidate keys
as gather-sort-scatter (a batch-sized all-gather that would serialize DP
scaling), or does it stay sharded?

Runs itself in a subprocess with 8 virtual CPU devices. Reports every
all-gather / all-reduce / reduce-scatter / collective-permute in the
optimized HLO with its result shape, flagging ones at candidate scale
(>= N*C/8 elements per replica, i.e. bigger than any param/grad tensor).

Usage: python -u scripts/probe_dp_hlo.py
"""

import os
import re
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)

CHILD = r"""
import re
import sys

import jax
jax.config.update('jax_platforms', 'cpu')
import jax.numpy as jnp

sys.path.insert(0, "@ROOT@")
import __graft_entry__ as g
from seal3d_tpu.parallel.mesh import make_mesh, replicate, data_sharding

import dataclasses

n = 8
mesh = make_mesh(jax.devices()[:n])
ngp, fcfg, opts, tcfg, ds, Trainer = g._setup(n_rays=1024, h=16, w=16,
                                              log2_hashmap=12)
# the production train path: flat-packed march (march_rays_flat ->
# compact_flat_direct), the path whose global sort/cumsum couple the batch
opts = dataclasses.replace(opts, flat_frac=0.5)
tr = Trainer(ngp, fcfg, opts, tcfg, dataset=ds, mesh=mesh,
             key=jax.random.PRNGKey(0))
print('pack_shards =', tr.opts.pack_shards)
state = tr.init_state()
state = jax.device_put(state, replicate(mesh))
lowered = tr._train_step.lower(state, jax.random.PRNGKey(2))
txt = lowered.compile().as_text()

# Collect collective ops with their result shapes from the optimized HLO.
pat = re.compile(
    r'^\s*(?:ROOT\s+)?%?[\w.\-]+ = (\S+) (all-gather|all-reduce|'
    r'reduce-scatter|collective-permute|all-to-all)\(', re.M)
rows = []
for m in pat.finditer(txt):
    shape, op = m.group(1), m.group(2)
    dims = re.findall(r'\[([0-9,]*)\]', shape)
    nelem = 1
    if dims and dims[0]:
        for d in dims[0].split(','):
            nelem *= int(d)
    rows.append((op, shape, nelem))

n_rays, n_cand = 1024, opts.num_candidates
per_shard = n_rays * n_cand // n
print(f'collectives in optimized train-step HLO '
      f'(N={n_rays}, C={n_cand}, per-shard candidates={per_shard}):')
big = 0
for op, shape, nelem in sorted(rows, key=lambda r: -r[2]):
    flag = '  <-- BATCH-SCALE' if nelem >= per_shard else ''
    if nelem >= per_shard:
        big += 1
    print(f'  {op:20s} {shape:40s} n={nelem}{flag}')
if not rows:
    print('  (none)')
print(f'RESULT: {big} batch-scale collectives '
      f'({"DP sort gathers - needs shard_map" if big else "sort stays sharded"})')

# Post-SPMD shapes are PER-SHARD: a dot whose M dim equals the FULL flat
# budget is running replicated on every chip. Print the largest dots.
dpat = re.compile(r'^\s*(?:ROOT\s+)?%?[\w.\-]+ = (\S+) dot\(', re.M)
dots = []
for m in dpat.finditer(txt):
    shape = m.group(1)
    dims = re.findall(r'\[([0-9,]*)\]', shape)
    nelem = 1
    if dims and dims[0]:
        for d in dims[0].split(','):
            nelem *= int(d)
    dots.append((shape, nelem))
print('largest dot results (per-shard shapes):')
for shape, nelem in sorted(dots, key=lambda r: -r[1])[:10]:
    print(f'  dot {shape:40s} n={nelem}')
# And the largest sorts.
spat = re.compile(r'^\s*(?:ROOT\s+)?%?[\w.\-]+ = (\S+) sort\(', re.M)
print('sorts (per-shard shapes):')
for m in spat.finditer(txt):
    print(f'  sort {m.group(1)}')

# Context for any batch-scale all-gather: the defining line + consumers.
for line in txt.splitlines():
    if ' all-gather(' in line and '[1024' in line.replace(' ', ''):
        name = line.strip().split(' = ')[0].lstrip('%')
        print('GATHER DEF:', line.strip()[:240])
        for l2 in txt.splitlines():
            if name in l2 and ' = ' in l2 and not l2.strip().startswith(
                    ('%' + name, name)):
                print('  consumer:', l2.strip()[:240])
"""


def main():
    env = dict(os.environ)
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=8"
                        + " --xla_llvm_disable_expensive_passes=true").strip()
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run([sys.executable, "-u", "-c",
                           CHILD.replace("@ROOT@", ROOT)],
                          env=env, cwd=ROOT, text=True, timeout=1800)
    sys.exit(proc.returncode)


if __name__ == "__main__":
    main()
