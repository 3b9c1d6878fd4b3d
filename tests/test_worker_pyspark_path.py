"""The no-zip SPARK_HOME stub (session._nozip_spark_home).

Worker interpreters fall back to their own site-packages pyspark (cached
bytecode) only if the stub really mirrors the distro minus python/lib —
a broken stub would fail JVM launch, a zip left behind would silently
keep the slow path.
"""

import os
import zipfile

import pytest

from django_datastream_spark.session import _nozip_spark_home


@pytest.fixture()
def fake_home(tmp_path):
    home = tmp_path / "spark_dist"
    (home / "python" / "lib").mkdir(parents=True)
    (home / "python" / "pyspark").mkdir()
    (home / "bin").mkdir()
    (home / "jars").mkdir()
    (home / "conf").mkdir()
    (home / "RELEASE").write_text("Spark fake\n")
    import pyspark

    with zipfile.ZipFile(home / "python" / "lib" / "pyspark.zip", "w") as zf:
        zf.writestr(
            "pyspark/version.py", f"__version__: str = '{pyspark.__version__}'\n"
        )
    return home


def test_stub_mirrors_all_but_python_lib(fake_home):
    stub = _nozip_spark_home(str(fake_home))
    assert stub is not None and stub != str(fake_home)
    for entry in os.listdir(fake_home):
        if entry == "python":
            continue
        link = os.path.join(stub, entry)
        assert os.path.islink(link), entry
        assert os.readlink(link) == os.path.join(str(fake_home), entry)
    lib = os.path.join(stub, "python", "lib")
    assert os.path.isdir(lib)
    assert not any(f.endswith(".zip") for f in os.listdir(lib))
    # $SPARK_HOME/python/pyspark stays resolvable
    assert os.path.islink(os.path.join(stub, "python", "pyspark"))
    # idempotent: second call returns the same stub without error
    assert _nozip_spark_home(str(fake_home)) == stub


def test_stub_refused_on_version_drift(fake_home):
    zip_path = fake_home / "python" / "lib" / "pyspark.zip"
    with zipfile.ZipFile(zip_path, "w") as zf:
        zf.writestr("pyspark/version.py", "__version__: str = '0.0.0'\n")
    assert _nozip_spark_home(str(fake_home)) is None


def test_stub_refused_when_driver_pyspark_is_the_distro(tmp_path, monkeypatch):
    import pyspark

    # a "distro" that IS the import the driver resolved: nothing to fall
    # back to, so the helper must leave SPARK_HOME alone
    home = os.path.dirname(os.path.dirname(os.path.abspath(pyspark.__file__)))
    zip_dir = os.path.join(home, "python", "lib")
    if not os.path.exists(os.path.join(zip_dir, "pyspark.zip")):
        pytest.skip("driver pyspark layout has no python/lib zip to test")
    assert _nozip_spark_home(home) is None


def test_stub_none_for_ziplesss_home(tmp_path):
    home = tmp_path / "pip_layout"
    home.mkdir()
    assert _nozip_spark_home(str(home)) is None
