#!/bin/sh
# Package jsonld_ex_spark for spark-submit --py-files.
set -e
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/jsonld_ex_spark.zip
python -c "
import zipfile, pathlib
zf = zipfile.ZipFile('dist/jsonld_ex_spark.zip', 'w', zipfile.ZIP_DEFLATED)
for p in sorted(pathlib.Path('jsonld_ex_spark').rglob('*.py')):
    zf.write(p, p.as_posix())
zf.close()
print('wrote dist/jsonld_ex_spark.zip')
"
