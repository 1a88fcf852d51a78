"""Chain / sampler-state checkpointing.

The reference's suspend/resume keeps a live coroutine in process memory
(MCMC.jl:33-39) — a chain cannot survive the session.  Here sampler state is
an explicit pytree, so checkpointing is plain serialization: ``save_task`` /
``load_task`` round-trip the continuation (state pytree + PRNG key + step
position) through an ``.npz`` file, and ``save_chain`` also persists the
kept samples/gradients/diagnostics.  Resuming a loaded task continues the
chain bit-exactly, tuner state included.
"""
from __future__ import annotations

import json

import jax
import numpy as np

from ..core.chain import MCMCChain
from ..core.task import MCMCTask
from ..utils.table import Table


def _flatten_state(state):
    leaves, treedef = jax.tree_util.tree_flatten(state)
    return leaves, treedef


def save_task(path, task: MCMCTask):
    """Persist a task's continuation (state + key + pos) to ``path``.npz.

    The model/sampler/runner themselves are code, not data — the caller
    re-creates them (same as the reference, where the coroutine captures
    them) and re-attaches the loaded state with :func:`load_task_into`.
    """
    assert task.state is not None, "task has no live state (run it first)"
    leaves, treedef = _flatten_state(task.state)
    arrays = {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}
    arrays["key"] = np.asarray(task.key)
    arrays["pos"] = np.asarray(task.pos)
    np.savez(path, **arrays)


def load_task_into(path, task: MCMCTask) -> MCMCTask:
    """Load a continuation saved by :func:`save_task` into a freshly-built
    task with the same model/sampler/runner structure."""
    data = np.load(path if str(path).endswith(".npz") else str(path) + ".npz")
    # build a template state to recover the treedef
    import jax.numpy as jnp

    template = task.state
    if template is None:
        template = task.sampler.init(task.model, task.model.init,
                                     jax.random.PRNGKey(0))
    leaves, treedef = _flatten_state(template)
    new_leaves = [
        jnp.asarray(data[f"leaf_{i}"]) for i in range(len(leaves))
    ]
    state = jax.tree_util.tree_unflatten(treedef, new_leaves)
    return MCMCTask(task.model, task.sampler, task.runner, state=state,
                    key=jax.numpy.asarray(data["key"]), pos=int(data["pos"]))


def save_chain(path, chain: MCMCChain):
    """Persist kept samples/gradients/diagnostics + the continuation."""
    arrays = {
        "samples": chain.samples.values,
        "range": np.asarray([chain.range.start, chain.range.stop,
                             chain.range.step]),
        "run_time": np.asarray(chain.run_time),
    }
    if not chain.gradients.empty:
        arrays["gradients"] = chain.gradients.values
    for k, v in chain.diagnostics.items():
        arrays[f"diag_{k}"] = np.asarray(v)
    meta = {"columns": chain.samples.columns}
    arrays["meta"] = np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8)
    task = chain.task if isinstance(chain.task, MCMCTask) else None
    if task is not None and task.state is not None:
        leaves, _ = _flatten_state(task.state)
        for i, l in enumerate(leaves):
            arrays[f"leaf_{i}"] = np.asarray(l)
        arrays["key"] = np.asarray(task.key)
        arrays["pos"] = np.asarray(task.pos)
    np.savez(path, **arrays)


def load_chain(path, task: MCMCTask = None) -> MCMCChain:
    """Load a chain saved by :func:`save_chain`; pass the re-created task to
    restore the continuation (enabling resume)."""
    data = np.load(path if str(path).endswith(".npz") else str(path) + ".npz")
    meta = json.loads(bytes(data["meta"]).decode())
    columns = meta["columns"]
    samples = Table(data["samples"], columns)
    gradients = (
        Table(data["gradients"], columns)
        if "gradients" in data
        else Table(np.zeros((0, len(columns))), columns)
    )
    diags = {k[5:]: data[k] for k in data.files if k.startswith("diag_")}
    start, stop, step = (int(x) for x in data["range"])
    new_task = task
    if task is not None and "key" in data.files:
        import jax.numpy as jnp

        template = task.state
        if template is None:
            template = task.sampler.init(task.model, task.model.init,
                                         jax.random.PRNGKey(0))
        leaves, treedef = _flatten_state(template)
        state = jax.tree_util.tree_unflatten(
            treedef, [jnp.asarray(data[f"leaf_{i}"]) for i in range(len(leaves))]
        )
        new_task = MCMCTask(task.model, task.sampler, task.runner, state=state,
                            key=jnp.asarray(data["key"]), pos=int(data["pos"]))
    return MCMCChain(
        range=range(start, stop, step),
        samples=samples,
        gradients=gradients,
        diagnostics=diags,
        task=new_task,
        run_time=float(data["run_time"]),
    )
