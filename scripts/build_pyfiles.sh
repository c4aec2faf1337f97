#!/bin/sh
# Package thecrowler_spark for spark-submit --py-files.
# Usage: scripts/build_pyfiles.sh  →  dist/thecrowler_spark.zip
set -e
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/thecrowler_spark.zip
python - <<'EOF'
import os, zipfile
with zipfile.ZipFile("dist/thecrowler_spark.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for root, _dirs, files in os.walk("thecrowler_spark"):
        if "__pycache__" in root:
            continue
        for f in files:
            if f.endswith(".py"):
                z.write(os.path.join(root, f))
print("wrote dist/thecrowler_spark.zip")
EOF
