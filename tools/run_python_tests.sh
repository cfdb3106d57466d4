#!/usr/bin/env bash
# Run the Python façade tests against the packaged graft jar.
#   tools/run_python_tests.sh [--skip-package]
set -euo pipefail
cd "$(dirname "$0")/.."

if [[ "${1:-}" != "--skip-package" ]]; then
  sbt -batch package
fi

# exclude the -tests jar: when `sbt test` and `sbt package` land in the
# same mtime second, `ls -t` order is arbitrary and can pick the tests
# jar, whose classpath lacks the py4j façade ("JavaPackage not callable")
JAR=$(ls -t target/scala-2.13/*.jar | grep -v -- '-tests.jar' | head -1)
export SQLFLOW_LIB="$PWD/$JAR"
export SPARK_LOCAL_IP=127.0.0.1

cd python
exec python3 -m unittest tests.test_sqlflow tests.test_multimodal -v
