from pyspark.sql import functions as F

from kgforge.datapipe.phonetic import soundex_key

# the classic published test vectors, including the H/W transparency
# rule (Ashcraft must NOT be A226) and same-code first-letter collapse
GOLDENS = {
    "Robert": "R163",
    "Rupert": "R163",
    "Rubin": "R150",
    "Ashcraft": "A261",
    "Ashcroft": "A261",
    "Tymczak": "T522",
    "Pfister": "P236",
    "Honeyman": "H555",
    "Washington": "W252",
    "Lee": "L000",
    "Gutierrez": "G362",
    "Jackson": "J250",
}


def test_classic_goldens(spark):
    df = spark.createDataFrame([(n,) for n in GOLDENS], "name string")
    got = {r["name"]: r["sx"]
           for r in df.select("name", soundex_key(F.col("name")).alias("sx")).collect()}
    assert got == GOLDENS


def test_case_and_punctuation_insensitive(spark):
    df = spark.createDataFrame(
        [("o'brien",), ("OBRIEN",), ("O Brien",)], "name string"
    )
    got = {r["sx"] for r in df.select(soundex_key(F.col("name")).alias("sx")).collect()}
    assert got == {"O165"}


def test_degenerate_inputs(spark):
    df = spark.createDataFrame([("123",), ("",), (None,)], "name string")
    got = [r["sx"] for r in df.select(soundex_key(F.col("name")).alias("sx")).collect()]
    assert got == [None, None, None]
