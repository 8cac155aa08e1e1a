-- Reference: CDK/cdk/athena_queries/arrest_pct_by_community_VIOLENT.txt:1-24
-- Deviation (documented): ", community_area" added to ORDER BY — the
-- reference's top-15 is tie-ambiguous; we make it deterministic.
CREATE OR REPLACE TEMP VIEW arrest_pct_by_community_violent AS SELECT
    tr.community_area,
    ta.tot_arrests,
    tr.tot_reports,
    ROUND(CAST(ta.tot_arrests AS double) / CAST(tr.tot_reports as double)*100, 2) AS arrest_pct
FROM
(
SELECT
    COUNT(*) AS tot_reports,
    community_area
FROM dependency1_violent_crimes
GROUP BY community_area
) tr INNER JOIN
    (
    SELECT
        COUNT(*) AS tot_arrests,
        community_area
    FROM dependency1_violent_crimes
    WHERE arrest = True
    GROUP BY community_area
    ) ta
ON tr.community_area = ta.community_area
ORDER BY tot_reports DESC, community_area
LIMIT 15
