"""S3 source: mysqldump INSERT parsing (pure-python unit + Spark end-to-end)."""

import gzip

from wikipedia_wikidata_spark.sources.mysqldump import (
    parse_insert_line,
    parse_values,
    read_mysqldump,
)


def test_parse_values_grammar():
    rows = parse_values("(1,'a',NULL),(2,'b,with,comma',3.5)")
    assert rows == [["1", "a", None], ["2", "b,with,comma", "3.5"]]
    # escapes: \' doubled '' backslash newline; parens inside strings
    rows = parse_values(r"(3,'it\'s','a\\b'),(4,'x''y','(not a row)')")
    assert rows == [["3", "it's", "a\\b"], ["4", "x'y", "(not a row)"]]
    rows = parse_values("(5,'multi\\nline','NULL')")
    assert rows == [["5", "multi\nline", "NULL"]]  # quoted 'NULL' is a string
    assert parse_values("(NULL)") == [[None]]


def test_parse_insert_line_table_filter():
    line = "INSERT INTO `page` VALUES (1,0,'Title_1'),(2,1,'Talk:x');"
    assert parse_insert_line(line, "page") == [
        ["1", "0", "Title_1"], ["2", "1", "Talk:x"],
    ]
    assert parse_insert_line(line, "redirect") == []
    assert parse_insert_line("-- comment", "page") == []
    assert parse_insert_line("CREATE TABLE `page` (...);", "page") == []


def test_read_mysqldump_end_to_end(spark, tmp_path):
    dump = tmp_path / "page.sql"
    dump.write_text(
        "-- MySQL dump\n"
        "CREATE TABLE `page` (`id` int, `ns` int, `title` varbinary(255));\n"
        "INSERT INTO `page` VALUES (1,0,'A'),(2,0,'B''s title'),(3,1,'Talk:A');\n"
        "INSERT INTO `page` VALUES (4,0,'C,comma'),(5,0,NULL);\n"
        "/* trailer */\n"
    )
    df = read_mysqldump(spark, str(dump), "page")
    got = sorted([tuple(r.fields) for r in df.collect()])
    assert got == [
        ("1", "0", "A"),
        ("2", "0", "B's title"),
        ("3", "1", "Talk:A"),
        ("4", "0", "C,comma"),
        ("5", "0", None),
    ]
    # P1 semantics over the parsed source (filter ns=0, non-empty title)
    from pyspark.sql import functions as F

    page = df.select(
        F.col("fields")[0].cast("int").alias("page_id"),
        F.col("fields")[1].alias("ns"),
        F.col("fields")[2].alias("title"),
    ).filter((F.col("ns") == "0") & (F.length("title") > 0))
    assert {(r.page_id, r.title) for r in page.collect()} == {
        (1, "A"), (2, "B's title"), (4, "C,comma"),
    }
