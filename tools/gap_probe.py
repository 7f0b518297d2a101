"""Per-round probe for the documented environment gaps (VERDICT r2 #9):
Iceberg runtime jar, media codecs (PIL / soundfile / av), and
google.protobuf (needed by transformWithStateInPandas' state server).
If any flips to available, execute the already-written paths and convert
the README caveats into tests. Prints one JSON line for the round notes.
"""

from __future__ import annotations

import glob
import importlib
import json
import os


def _importable(mod: str) -> bool:
    try:
        importlib.import_module(mod)
        return True
    except ImportError:
        return False


def main() -> None:
    spark_home = os.environ.get("SPARK_HOME", "")
    jar_dirs = [os.path.join(spark_home, "jars"), "/root/.ivy2/jars"]
    iceberg_jars = [j for d in jar_dirs
                    for j in glob.glob(os.path.join(d, "*iceberg*.jar"))]
    print(json.dumps({
        "iceberg_runtime_jar": bool(iceberg_jars),
        "pil": _importable("PIL"),
        "soundfile": _importable("soundfile"),
        "av": _importable("av"),
        "protobuf": _importable("google.protobuf"),
    }))


if __name__ == "__main__":
    main()
