-- Reference: CDK/cdk/cdk_stack.py:113-134 — the supporting/ crawler
-- registers a community-areas lookup table, but no committed query
-- ever joins it: this view is the enrichment the reference
-- provisioned for and never shipped. Depends on
-- arrest_pct_by_community_violent (file sorts after it) and on the
-- community_areas supporting table (pipeline step_supporting).
CREATE OR REPLACE TEMP VIEW violent_by_community_enriched AS
SELECT
    a.community_area,
    c.name AS community_name,
    c.side,
    c.population,
    a.tot_arrests,
    a.tot_reports,
    a.arrest_pct
FROM arrest_pct_by_community_violent a
JOIN community_areas c ON a.community_area = c.community_area
