"""Custom stateful streaming operator (SURVEY.md §2 B20): the reference's
selection toggle as a stream.

The widget mutates its selection state one click at a time
(`updateClicked`, /root/reference/index.js:510-534): a (date_key, compound)
click inserts the key, a repeat click removes it. Streamed, that is a
keyed stateful operator: group clicks by compound, keep the compound's
selected-key set as managed state, flip membership per click, and emit the
post-batch membership of every touched key.

Semantics are order-free within a batch (membership depends only on click
PARITY — odd flips, even restores), so the operator is deterministic under
any partitioning/arrival order, and over a finite replay the final state is
SQL-expressible: selected ⟺ total click count is odd. That makes this the
rare custom stateful op with an exact DuckDB oracle.

State design for scale: state lives per compound key in the state store
(RocksDB-backed on a real cluster), sized by |selected keys per compound| —
the human/rule-flagged outlier set, small by construction. Each micro-batch
touches only clicked groups; emitted rows carry a per-group batch sequence
number so downstream consumers (and the suite's finalizer) can take the
latest row per key with `max_by` instead of trusting sink ordering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupStateTimeout

OUTPUT_SCHEMA = (
    "compound string, date_key string, selected boolean, "
    "n_toggles long, batch_seq long"
)
STATE_SCHEMA = "keys array<string>, seq long"


def _make_toggle_group():
    """Build the per-group state function as a NESTED def: cloudpickle then
    serializes it by value, so Python workers never need this package on
    their import path (module-level functions pickle by reference and fail
    when the driver runs from outside the repo)."""

    def _toggle_group(key, pdfs, state):
        import pandas as pd

        if state.exists:
            keys, seq = state.get
            selected = set(keys)
        else:
            selected, seq = set(), 0
        seq += 1

        counts: dict[str, int] = {}
        for pdf in pdfs:
            for k in pdf["date_key"]:
                counts[k] = counts.get(k, 0) + 1

        out = {"date_key": [], "selected": [], "n_toggles": []}
        for k in sorted(counts):
            if counts[k] % 2 == 1:  # odd click count flips membership
                if k in selected:
                    selected.discard(k)
                else:
                    selected.add(k)
            out["date_key"].append(k)
            out["selected"].append(k in selected)
            out["n_toggles"].append(counts[k])

        state.update((sorted(selected), seq))
        yield pd.DataFrame(
            {
                "compound": key[0],
                "date_key": out["date_key"],
                "selected": out["selected"],
                "n_toggles": out["n_toggles"],
                "batch_seq": seq,
            }
        )

    return _toggle_group


def toggle_stream(clicks: DataFrame) -> DataFrame:
    """clicks(compound, date_key) stream → per-batch membership updates.

    Output: (compound, date_key, selected, n_toggles, batch_seq) for every
    key clicked in the batch; `selected` is the post-batch membership.
    """
    return clicks.groupBy("compound").applyInPandasWithState(
        _make_toggle_group(),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
