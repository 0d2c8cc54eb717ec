"""FastAPI web front-end (reference api.py:82-160): POST /run-etl
(upload or generate) -> background job -> zip download; GET /status/{id}
poll; GET /download/{id}.

fastapi/uvicorn are not installed in this sandbox, so `create_app()` is
import-gated — the module documents and preserves the endpoint contract
for environments that have them. Job state lives in a module dict keyed
by session id (reference api.py:26), one shared SparkSession serves all
jobs, and each job gets its own output dir + zip.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid
import zipfile

JOBS: dict[str, dict] = {}


def run_etl_job(spark, session_id: str, config: dict, workdir: str) -> None:
    """Background task body (reference api.py:41-78): run the pipeline into
    a per-session dir, zip the outputs, record status."""
    from .pipeline import Pipeline

    try:
        out_dir = os.path.join(workdir, session_id)
        config = {**config, "output": {**config["output"], "path": out_dir}}
        Pipeline(config, spark).run()
        zip_path = os.path.join(workdir, f"{session_id}.zip")
        with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
            for name in os.listdir(out_dir):
                zf.write(os.path.join(out_dir, name), name)
        shutil.rmtree(out_dir, ignore_errors=True)
        JOBS[session_id] = {"status": "completed", "download": f"/download/{session_id}", "zip": zip_path}
    except Exception as exc:  # noqa: BLE001 - job boundary
        JOBS[session_id] = {"status": "failed", "error": str(exc)}


def create_app(spark=None, workdir: str | None = None):
    """Build the FastAPI app (raises a clear error when fastapi is absent)."""
    try:
        from fastapi import BackgroundTasks, FastAPI, UploadFile
        from fastapi.responses import FileResponse, JSONResponse
    except ImportError as exc:  # pragma: no cover - env-dependent
        raise NotImplementedError(
            "the web API requires fastapi, which is not installed in this environment"
        ) from exc

    from ..session import get_spark

    spark = spark or get_spark(app_name="laposte_etl_api")
    workdir = workdir or tempfile.mkdtemp(prefix="laposte_api_")
    app = FastAPI(title="SuperCourier ETL (PySpark)")

    @app.post("/run-etl")
    async def run_etl(
        background_tasks: BackgroundTasks,
        rows: int = 1000,
        formats: str = "all",
        file: UploadFile | None = None,
    ):
        session_id = uuid.uuid4().hex
        if file is not None:
            suffix = os.path.splitext(file.filename or "upload.csv")[1]
            src_path = os.path.join(workdir, f"{session_id}{suffix}")
            with open(src_path, "wb") as fh:
                fh.write(await file.read())
            source = {"type": "file", "path": src_path}
        else:
            source = {"type": "generate", "rows": rows}
        config = {"source": source, "output": {"path": "", "format": formats}}
        JOBS[session_id] = {"status": "running"}
        background_tasks.add_task(run_etl_job, spark, session_id, config, workdir)
        return {"session_id": session_id}

    @app.get("/status/{session_id}")
    def status(session_id: str):
        job = JOBS.get(session_id)
        if job is None:
            return JSONResponse({"status": "unknown"}, status_code=404)
        return {k: v for k, v in job.items() if k != "zip"}

    @app.get("/download/{session_id}")
    def download(session_id: str):
        job = JOBS.get(session_id)
        if not job or job.get("status") != "completed":
            return JSONResponse({"error": "not ready"}, status_code=404)
        return FileResponse(job["zip"], filename=f"{session_id}.zip")

    return app
