"""Entity-resolution cascade: tier precedence, blocked fuzzy recall,
greedy claim dedup (person_matcher/project_enrichment parity)."""

import pandas as pd
import pytest

from horizon_etl_ray.functions import entity_resolution as er


def test_lev_token_sort_ratio():
    assert er.lev_token_sort_ratio("John A Smith", "Smith John A") == 100
    assert er.lev_token_sort_ratio("", "") == 100
    r = er.lev_token_sort_ratio("maria silva santos", "maria silva x santos")
    assert 85 <= r < 100


def test_cascade_tiers_and_claims():
    import ray.data as rd

    reg = pd.DataFrame({
        "rid": [1, 2, 3],
        "name": ["Ana Beatriz Costa", "Bruno Lima Souza", "Carla Dias Rocha"]})
    inc = pd.DataFrame({
        "id": [10, 11, 12, 13, 14],
        "name": [
            "Ana Beatriz Costa",        # raw
            "ANA BEATRIZ COSTA",        # normalized (dup claim on rid 1)
            "Bruno Lima X Souza",       # fuzzy (block bruno|souza)
            "Zuleica Nobody Q",         # none
            "Carla  Dias   Rocha",      # normalized (whitespace)
        ]})
    out = er.resolve_entities(
        rd.from_pandas(inc), rd.from_pandas(reg),
        incoming_id="id", incoming_name="name",
        registry_id="rid", registry_name="name", fuzzy_threshold=85,
    ).to_pandas().set_index("incoming_id")

    assert out.loc[10, "tier"] == "raw" and out.loc[10, "matched_id"] == 1
    assert out.loc[11, "tier"] == "normalized" and out.loc[11, "matched_id"] == 1
    assert out.loc[12, "tier"] == "fuzzy" and out.loc[12, "matched_id"] == 2
    assert out.loc[13, "tier"] == "none" and out.loc[13, "matched_id"] == -1
    assert out.loc[14, "tier"] == "normalized" and out.loc[14, "matched_id"] == 3
    # claim dedup: rid 1 claimed twice -> raw (score tie, lower id) wins
    assert bool(out.loc[10, "won"]) and not bool(out.loc[11, "won"])
    assert not bool(out.loc[13, "won"])


def test_fuzzy_respects_blocking():
    import ray.data as rd

    reg = pd.DataFrame({"rid": [1], "name": ["Ana Beatriz Costa"]})
    # same letters but different first/last tokens -> different block -> none
    inc = pd.DataFrame({"id": [20], "name": ["Beatriz Costa Ana"]})
    out = er.resolve_entities(
        rd.from_pandas(inc), rd.from_pandas(reg),
        incoming_id="id", incoming_name="name",
        registry_id="rid", registry_name="name",
    ).to_pandas()
    assert out.iloc[0]["tier"] == "none"


def test_partitioned_mode_matches_broadcast():
    """The co-shuffle cascade (registry too big to broadcast) must produce
    the same output as the broadcast plan — the block key co-locates every
    tier's candidates."""
    import ray.data as rd

    from horizon_etl_ray.pipelines.analytics import entity_resolution_cascade

    reg = pd.DataFrame({
        "rid": [1, 2, 3, 4],
        "name": ["Ana Beatriz Costa", "Bruno Lima Souza",
                 "Carla Dias Rocha", "Ana Beatriz Costa"]})  # dup name
    inc = pd.DataFrame({
        "id": [10, 11, 12, 13, 14],
        "name": ["Ana Beatriz Costa", "ANA BEATRIZ COSTA",
                 "Bruno Lima X Souza", "Zuleica Nobody Q",
                 "Carla  Dias   Rocha"]})
    outs = {}
    for mode in ("broadcast", "partitioned"):
        out = er.resolve_entities(
            rd.from_pandas(inc), rd.from_pandas(reg),
            incoming_id="id", incoming_name="name",
            registry_id="rid", registry_name="name", fuzzy_threshold=85,
            mode=mode,
        ).to_pandas().sort_values("incoming_id").reset_index(drop=True)
        outs[mode] = out
    pd.testing.assert_frame_equal(outs["broadcast"], outs["partitioned"])
    # duplicate registry names resolve to min rid in both modes
    assert outs["partitioned"].set_index("incoming_id").loc[10, "matched_id"] == 1
