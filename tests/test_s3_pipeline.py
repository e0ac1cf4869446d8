"""S4 end-to-end: the full artifact pipeline against a mocked S3 store.

The reference's own e2e runs against moto's @mock_s3
(/root/reference/tests/test_data_pipeline.py:23-72); that decorator only
patches the DRIVER process, and our writers execute inside Spark's
Python workers — separate processes — so the mock must be a real local
HTTP endpoint instead: moto's ThreadedMotoServer, with credentials
injected through S3Writer.client_kwargs (no ambient AWS config on
executors).

The parity bar: an S3 run must produce exactly the key set a FileWriter
run produces as relative paths, with byte-identical artifact content.
"""

from __future__ import annotations

import glob
import os

import pytest

boto3 = pytest.importorskip("boto3")
pytest.importorskip("moto")

from slow_tortoise_spark.pipeline import PipelineParams, run_pipeline  # noqa: E402

BUCKET = "tortoise-test"


@pytest.fixture(scope="module")
def moto_endpoint():
    """A real (thread-served) S3 endpoint reachable from executor
    Python workers on this host."""
    from moto.server import ThreadedMotoServer

    server = ThreadedMotoServer(port=0, verbose=False)
    server.start()
    host, port = server._server.server_address[:2]
    url = f"http://127.0.0.1:{port}"
    yield url
    server.stop()


def _client(endpoint):
    return boto3.client(
        "s3",
        endpoint_url=endpoint,
        region_name="us-east-1",
        aws_access_key_id="testing",
        aws_secret_access_key="testing",
    )


def _params(cube_path, **kw):
    return PipelineParams(
        data_id="d1",
        run_id="r-s3",
        data_paths=[cube_path],
        time_resolutions=("month",),
        **kw,
    )


def test_s3_pipeline_matches_file_pipeline(spark, cube_path, tmp_path,
                                           moto_endpoint):
    """dest_type='s3' writes the same artifact tree a file run writes —
    same keys, same bytes — through executor-side put_object calls."""
    _client(moto_endpoint).create_bucket(Bucket=BUCKET)

    file_root = str(tmp_path / "file_run")
    run_pipeline(spark, _params(cube_path, dest_root=file_root,
                                dest_type="file"))
    run_pipeline(
        spark,
        _params(
            cube_path,
            dest_root=BUCKET,
            dest_type="s3",
            extra_writer_args={
                "endpoint_url": moto_endpoint,
                "client_kwargs": {
                    "region_name": "us-east-1",
                    "aws_access_key_id": "testing",
                    "aws_secret_access_key": "testing",
                },
            },
        ),
    )

    file_keys = {
        os.path.relpath(p, file_root)
        for p in glob.glob(f"{file_root}/**/*", recursive=True)
        if os.path.isfile(p)
    }
    s3 = _client(moto_endpoint)
    s3_keys = set()
    token = None
    while True:
        kw = {"ContinuationToken": token} if token else {}
        page = s3.list_objects_v2(Bucket=BUCKET, **kw)
        s3_keys |= {o["Key"] for o in page.get("Contents", [])}
        token = page.get("NextContinuationToken")
        if not token:
            break
    assert s3_keys == file_keys and s3_keys

    # every artifact family made it through an executor-side writer
    assert any(k.endswith("global.csv") for k in s3_keys)
    assert any("/tiles/" in k and k.endswith(".tile") for k in s3_keys)
    assert any(k.endswith("region_lists.json") for k in s3_keys)
    assert any(k.endswith("results.json") for k in s3_keys)

    # byte parity on one CSV, one binary tile, and the run record
    for key in (
        next(k for k in sorted(s3_keys) if k.endswith("global.csv")),
        next(k for k in sorted(s3_keys) if k.endswith(".tile")),
        next(k for k in sorted(s3_keys) if k.endswith("results.json")),
    ):
        body = s3.get_object(Bucket=BUCKET, Key=key)["Body"].read()
        with open(os.path.join(file_root, key), "rb") as f:
            assert body == f.read(), key
