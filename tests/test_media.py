"""Media-ref hydration (the synthetic blob-store fetch stage)."""


def test_hydrate_media_refs_deterministic_and_typed():
    import pyarrow as pa
    import ray.data

    from pdftext_ray.ops import media

    refs = [f"media://doc-{i:08d}/0" for i in range(20)]
    t = pa.table({"media_ref": refs})
    a = media.hydrate_media_refs(ray.data.from_arrow(t)).to_pandas()
    b = media.hydrate_media_refs(ray.data.from_arrow(t).repartition(4)).to_pandas()
    a = a.sort_values("media_ref").reset_index(drop=True)
    b = b.sort_values("media_ref").reset_index(drop=True)
    assert a.equals(b)
    assert set(a.columns) == {"media_ref", "media_type", "payload", "width", "height", "n_frames"}
    assert all(len(p) == 256 for p in a["payload"])
    # non-video rows always carry exactly one frame
    assert (a.loc[a["media_type"] != "video", "n_frames"] == 1).all()
    # the scalar twin agrees row for row
    r = media.hydrate_ref_scalar(refs[0])
    row = a[a["media_ref"] == refs[0]].iloc[0]
    assert (row["media_type"], row["width"], row["height"], row["n_frames"]) == (
        r["media_type"], r["width"], r["height"], r["n_frames"]
    )
