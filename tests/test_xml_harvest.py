"""3GPP XML harvest (S2): real ElementTree parse over mapInPandas."""

from __future__ import annotations

import textwrap

from minerva_etl_46_spark.sources.xml3gpp import harvest_3gpp_xml

XML = textwrap.dedent("""\
    <?xml version="1.0" encoding="UTF-8"?>
    <measCollecFile xmlns="http://www.3gpp.org/ftp/specs/archive/32_series/32.435#measCollec">
      <measData>
        <managedElement localDn="RNC01"/>
        <measInfo>
          <granPeriod duration="PT900S" endTime="2024-01-01T00:15:00+00:00"/>
          <measType p="1">attTCHSeizures</measType>
          <measType p="2">succTCHSeizures</measType>
          <measValue measObjLdn="RncFunction=RF-1,UtranCell=Gbg-997">
            <r p="1">234</r>
            <r p="2">987</r>
          </measValue>
          <measValue measObjLdn="RncFunction=RF-1,UtranCell=Gbg-998">
            <r p="1">890</r>
            <r p="2">NIL</r>
          </measValue>
        </measInfo>
      </measData>
    </measCollecFile>
""")


def test_harvest_3gpp_xml(spark, tmp_path):
    paths = []
    for i in range(3):
        p = tmp_path / f"A2024010{i}.xml"
        p.write_text(XML)
        paths.append(str(p))
    df = harvest_3gpp_xml(spark, paths)
    rows = df.collect()
    assert len(rows) == 12  # 3 files x 2 cells x 2 counters
    by = {(r["file"], r["dn"], r["counter"]): r["value"] for r in rows}
    f0 = paths[0]
    assert by[(f0, "RncFunction=RF-1,UtranCell=Gbg-997", "attTCHSeizures")] == 234.0
    assert by[(f0, "RncFunction=RF-1,UtranCell=Gbg-997", "succTCHSeizures")] == 987.0
    # unparseable counter value -> NULL, row preserved
    assert by[(f0, "RncFunction=RF-1,UtranCell=Gbg-998", "succTCHSeizures")] is None
    assert {r["ts"] for r in rows} == {"2024-01-01T00:15:00+00:00"}
