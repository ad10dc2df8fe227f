"""Property-based verification of merge_clauses against a pure-Python
reference model of Delta's conditional-MERGE semantics.

The reference model evaluates the same ordered first-true-clause rules
row by row in plain Python; hypothesis generates random target/source
contents and clause sets. Any divergence — ordering, NULL-condition
handling, carry-over, insert NULL-fill, by-source scoping — shows up
as a state mismatch with a shrunken counterexample.
"""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from databricks_data_warehouse_spark.sources.tables import ManagedTable

# slow tier: every clause class here is covered deterministically by
# test_merge_clauses.py / test_apply_changes.py / test_sql_dml.py —
# these are the randomized convergence sweeps (round 16 tiering)
pytestmark = pytest.mark.slow

# value domain is small so keys collide between target and source
_KEYS = st.integers(min_value=0, max_value=5)
_VALS = st.one_of(st.none(), st.integers(min_value=-3, max_value=3))


def _rows(draw, n_max):
    n = draw(st.integers(min_value=0, max_value=n_max))
    rows, seen = [], set()
    for _ in range(n):
        k = draw(_KEYS)
        if k in seen:  # unique keys per side (Delta's multi-match rule)
            continue
        seen.add(k)
        rows.append((k, draw(_VALS)))
    return rows


# conditions chosen from a closed set the Python model mirrors exactly.
# Each is (sql_text_for_merge_clauses, python_predicate(tgt_v, src_v));
# comparisons on NULL are "not fired" on both sides.
def _mk_cond(kind):
    if kind == 0:
        return None, lambda tv, sv: True
    if kind == 1:
        return "v > 0", lambda tv, sv: tv is not None and tv > 0
    if kind == 2:
        return "src.v > 0", lambda tv, sv: sv is not None and sv > 0
    return (
        "src.v > v",
        lambda tv, sv: tv is not None and sv is not None and sv > tv,
    )


_COND_KIND = st.integers(min_value=0, max_value=3)


@st.composite
def _scenario(draw):
    target = _rows(draw, 6)
    source = _rows(draw, 6)
    # matched: up to 2 ordered clauses, each delete or update v=src.v+1
    matched = []
    for _ in range(draw(st.integers(min_value=0, max_value=2))):
        cond = draw(_COND_KIND)
        act = draw(st.sampled_from(["delete", "update"]))
        matched.append((cond, act))
    not_matched = []
    for _ in range(draw(st.integers(min_value=0, max_value=2))):
        not_matched.append((draw(_COND_KIND), "insert"))
    by_source = []
    for _ in range(draw(st.integers(min_value=0, max_value=2))):
        by_source.append(
            (draw(_COND_KIND), draw(st.sampled_from(["delete", "update0"])))
        )
    return target, source, matched, not_matched, by_source


def _reference(target, source, matched, not_matched, by_source):
    """Pure-Python model: first-true-clause-fires per match class."""
    src = {k: v for k, v in source}
    out = {}
    for k, tv in target:
        if k in src:
            sv = src[k]
            fired = None
            for cond_kind, act in matched:
                _txt, pred = _mk_cond(cond_kind)
                if pred(tv, sv):
                    fired = act
                    break
            if fired == "delete":
                continue
            if fired == "update":
                out[k] = None if sv is None else sv + 1
            else:
                out[k] = tv  # carry
        else:
            fired = None
            for cond_kind, act in by_source:
                _txt, pred = _mk_cond(cond_kind)
                if pred(tv, None):
                    fired = act
                    break
            if fired == "delete":
                continue
            out[k] = 0 if fired == "update0" else tv
    tgt_keys = {k for k, _ in target}
    for k, sv in source:
        if k in tgt_keys:
            continue
        for cond_kind, _act in not_matched:
            _txt, pred = _mk_cond(cond_kind)
            if pred(None, sv):
                out[k] = sv
                break
    return out


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(_scenario())
def test_merge_clauses_matches_reference_model(spark, tmp_path_factory, sc):
    target, source, matched, not_matched, by_source = sc
    if not (matched or not_matched or by_source):
        return  # merge_clauses rejects empty clause sets (tested elsewhere)
    tmp = tmp_path_factory.mktemp("mcprop")
    t = ManagedTable(spark, "t", str(tmp / "t"))
    # TWO manifest entries (round 14): the default copy-on-write path
    # is now entry-scoped, so the model must hold when some entries
    # carry over untouched and others restage
    half = len(target) // 2
    t.overwrite(spark.createDataFrame(target[:half], "k long, v long"))
    if target[half:]:
        t.append(spark.createDataFrame(target[half:], "k long, v long"))
    src_df = spark.createDataFrame(source, "k long, v long")
    m = [
        (
            _mk_cond(ck)[0],
            "delete" if act == "delete" else {"v": "src.v + 1"},
        )
        for ck, act in matched
    ]
    nm = [(_mk_cond(ck)[0], "insert_all") for ck, _ in not_matched]
    bs = [
        (_mk_cond(ck)[0], "delete" if act == "delete" else {"v": "0"})
        for ck, act in by_source
    ]
    t.merge_clauses(src_df, ["k"], matched=m, not_matched=nm,
                    not_matched_by_source=bs)
    got = {r["k"]: r["v"] for r in t.read().collect()}
    want = _reference(target, source, matched, not_matched, by_source)
    assert got == want, (
        f"target={target} source={source} m={matched} "
        f"nm={not_matched} bs={by_source}"
    )


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(_scenario())
def test_merge_on_read_matches_reference_model(spark, tmp_path_factory, sc):
    """Round 13: the merge-on-read path (deletion_vectors=True) must
    satisfy the SAME reference model as the copy-on-write path — one
    shared model, two physical strategies."""
    target, source, matched, not_matched, by_source = sc
    if not (matched or not_matched or by_source):
        return
    tmp = tmp_path_factory.mktemp("mcdvprop")
    t = ManagedTable(spark, "t", str(tmp / "t"))
    t.overwrite(spark.createDataFrame(target, "k long, v long"))
    src_df = spark.createDataFrame(source, "k long, v long")
    m = [
        (
            _mk_cond(ck)[0],
            "delete" if act == "delete" else {"v": "src.v + 1"},
        )
        for ck, act in matched
    ]
    nm = [(_mk_cond(ck)[0], "insert_all") for ck, _ in not_matched]
    bs = [
        (_mk_cond(ck)[0], "delete" if act == "delete" else {"v": "0"})
        for ck, act in by_source
    ]
    t.merge_clauses(src_df, ["k"], matched=m, not_matched=nm,
                    not_matched_by_source=bs, deletion_vectors=True)
    got = {r["k"]: r["v"] for r in t.read().collect()}
    want = _reference(target, source, matched, not_matched, by_source)
    assert got == want, (
        f"target={target} source={source} m={matched} "
        f"nm={not_matched} bs={by_source}"
    )


@st.composite
def _rw_scenario(draw):
    rows = _rows(draw, 8)
    bound = draw(st.integers(min_value=-3, max_value=3))
    n_repl = draw(st.integers(min_value=0, max_value=4))
    # replacement rows must satisfy v < bound (Delta's contract);
    # give them fresh keys so duplicates don't confuse the reference
    repl = [
        (100 + i, draw(st.integers(min_value=-10, max_value=bound - 1)))
        for i in range(n_repl)
    ]
    return rows, bound, repl


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(_rw_scenario())
def test_replace_where_matches_delete_insert_reference(
    spark, tmp_path_factory, sc
):
    """replaceWhere ≡ (delete region) ∪ replacement, including NULL
    predicate rows KEPT — regardless of how the classifier split files
    into drop/carry/rewrite."""
    rows, bound, repl = sc
    tmp = tmp_path_factory.mktemp("rwprop")
    t = ManagedTable(spark, "t", str(tmp / "t"))
    t.overwrite(
        spark.createDataFrame(rows, "k long, v long").repartition(3)
    )
    t.replace_where(
        spark.createDataFrame(repl, "k long, v long"),
        [("v", "<", bound)],
    )
    got = sorted(
        (r["k"], r["v"]) for r in t.read().collect()
    )
    want = sorted(
        [(k, v) for k, v in rows if v is None or v >= bound] + repl
    )
    assert got == want, f"rows={rows} bound={bound} repl={repl}"


@st.composite
def _cdc_scenario(draw):
    # a set of changes: (key, val, seq unique-per-key, is_delete),
    # partitioned into 1-3 batches, delivered in a random batch order
    n = draw(st.integers(min_value=1, max_value=10))
    changes = []
    used = set()
    for _ in range(n):
        k = draw(_KEYS)
        seq = draw(st.integers(min_value=1, max_value=6))
        if (k, seq) in used:
            continue
        used.add((k, seq))
        changes.append(
            (k, draw(st.integers(min_value=0, max_value=9)), seq,
             draw(st.booleans()))
        )
    n_batches = draw(st.integers(min_value=1, max_value=3))
    batches = [[] for _ in range(n_batches)]
    for ch in changes:
        batches[draw(st.integers(min_value=0, max_value=n_batches - 1))].append(ch)
    order = draw(st.permutations(list(range(n_batches))))
    return batches, order


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(_cdc_scenario())
def test_scd1_apply_converges_to_lww_in_any_batch_order(
    spark, tmp_path_factory, sc
):
    """The tombstone design's core claim: the SCD1 fixpoint is the
    per-key argmax(sequence) of ALL changes (deletes included as
    tombstones), independent of how the changes were batched or in
    which order the batches arrived."""
    from databricks_data_warehouse_spark.pipelines.cdc import (
        apply_changes,
        scd1_current,
    )

    batches, order = sc
    tmp = tmp_path_factory.mktemp("cdcprop")
    t = ManagedTable(spark, "t", str(tmp / "t"))
    delivered = False
    for i in order:
        if not batches[i]:
            continue
        df = spark.createDataFrame(
            [(k, v, s, "delete" if d else "upsert")
             for k, v, s, d in batches[i]],
            "k long, v long, seq long, op string",
        )
        apply_changes(
            t, df, ["k"], "seq", apply_as_deletes="op = 'delete'",
            except_columns=["op"],
        )
        delivered = True
    if not delivered:
        return
    # reference: per-key argmax(seq) over ALL changes; visible if the
    # winning change is not a delete
    latest = {}
    for b in batches:
        for k, v, s, d in b:
            if k not in latest or s > latest[k][0]:
                latest[k] = (s, v, d)
    want = {k: (v, s) for k, (s, v, d) in latest.items() if not d}
    got = {
        r["k"]: (r["v"], r["seq"]) for r in scd1_current(t).collect()
    }
    assert got == want, f"batches={batches} order={order}"


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(_cdc_scenario())
def test_scd2_apply_converges_to_spliced_history_in_any_batch_order(
    spark, tmp_path_factory, sc
):
    """The event-splice design's core claim: the SCD2 fixpoint is the
    per-key sequence-ordered chain of ALL delivered changes — each
    upsert a row valid [its seq, next seq), deletes closing without a
    row — independent of batching and arrival order (ADVICE r09: the
    old first-seq gate dropped fresh changes that shared a batch with
    stale ones and diverged under reordering)."""
    from databricks_data_warehouse_spark.pipelines.cdc import (
        END_COL,
        START_COL,
        apply_changes,
        scd2_history,
    )

    batches, order = sc
    tmp = tmp_path_factory.mktemp("cdc2prop")
    t = ManagedTable(spark, "t2", str(tmp / "t2"))
    delivered = False
    for i in order:
        if not batches[i]:
            continue
        df = spark.createDataFrame(
            [(k, v, s, "delete" if d else "upsert")
             for k, v, s, d in batches[i]],
            "k long, v long, seq long, op string",
        )
        apply_changes(
            t, df, ["k"], "seq", apply_as_deletes="op = 'delete'",
            except_columns=["op"], stored_as_scd_type=2,
        )
        delivered = True
    if not delivered:
        return
    # reference model: per key, sort ALL changes by seq; row i is
    # valid [seq_i, seq_{i+1}) (None-ended if last); deletes emit none
    per_key = {}
    for b in batches:
        for k, v, s, d in b:
            per_key.setdefault(k, []).append((s, v, d))
    want = set()
    for k, evs in per_key.items():
        evs.sort()
        for i, (s, v, d) in enumerate(evs):
            if d:
                continue
            end = evs[i + 1][0] if i + 1 < len(evs) else None
            want.add((k, v, s, end))
    got = {
        (r["k"], r["v"], r[START_COL], r[END_COL])
        for r in scd2_history(t).collect()
    }
    assert got == want, f"batches={batches} order={order}"


@st.composite
def _cdc_tracked_scenario(draw):
    # (key, tracked v, untracked u, seq unique-per-key, is_delete)
    n = draw(st.integers(min_value=1, max_value=10))
    changes = []
    used = set()
    for _ in range(n):
        k = draw(_KEYS)
        seq = draw(st.integers(min_value=1, max_value=6))
        if (k, seq) in used:
            continue
        used.add((k, seq))
        changes.append(
            (
                k,
                draw(st.integers(min_value=0, max_value=2)),  # tracked
                draw(st.integers(min_value=0, max_value=9)),  # untracked
                seq,
                draw(st.booleans()),
            )
        )
    n_batches = draw(st.integers(min_value=1, max_value=3))
    batches = [[] for _ in range(n_batches)]
    for ch in changes:
        batches[draw(st.integers(min_value=0, max_value=n_batches - 1))].append(ch)
    order = draw(st.permutations(list(range(n_batches))))
    return batches, order


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(_cdc_tracked_scenario())
def test_scd2_tracked_apply_converges_in_any_batch_order(
    spark, tmp_path_factory, sc
):
    """VERDICT r10 item 5 done-criterion: with TRACK HISTORY ON a
    column subset, the stored __EVENTS array makes collapsing
    lossless — the fixpoint is the seq-ordered event chain collapsed
    by tracked-column runs, with untracked columns resolved by TRUE
    event order — independent of batching and arrival order."""
    from databricks_data_warehouse_spark.pipelines.cdc import (
        END_COL,
        START_COL,
        apply_changes,
        scd2_history,
    )

    batches, order = sc
    tmp = tmp_path_factory.mktemp("cdc2tprop")
    t = ManagedTable(spark, "t2t", str(tmp / "t2t"))
    delivered = False
    for i in order:
        if not batches[i]:
            continue
        df = spark.createDataFrame(
            [(k, v, u, s, "delete" if d else "upsert")
             for k, v, u, s, d in batches[i]],
            "k long, v long, u long, seq long, op string",
        )
        apply_changes(
            t, df, ["k"], "seq", apply_as_deletes="op = 'delete'",
            except_columns=["op"], stored_as_scd_type=2,
            track_history_column_list=["v"],
        )
        delivered = True
    if not delivered:
        return
    # reference: per key, seq-sorted events; an upsert whose tracked v
    # equals the PREVIOUS EVENT's v (previous also an upsert) merges
    # into the current version taking the latest values; deletes are
    # zero-width breaks; END = next version's start
    per_key = {}
    for b in batches:
        for k, v, u, s, d in b:
            per_key.setdefault(k, []).append((s, v, u, d))
    want = set()
    for k, evs in per_key.items():
        evs.sort()
        versions = []  # [start, v, u, is_tomb]
        prev = None
        for s, v, u, d in evs:
            if d:
                versions.append([s, None, None, True])
            elif prev is None or prev[3] or v != prev[1]:
                versions.append([s, v, u, False])
            else:
                versions[-1][1], versions[-1][2] = v, u
            prev = (s, v, u, d)
        for i, (start, v, u, tomb) in enumerate(versions):
            if tomb:
                continue
            end = versions[i + 1][0] if i + 1 < len(versions) else None
            want.add((k, v, u, start, end))
    got = {
        (r["k"], r["v"], r["u"], r[START_COL], r[END_COL])
        for r in scd2_history(t).collect()
    }
    assert got == want, f"batches={batches} order={order}"
