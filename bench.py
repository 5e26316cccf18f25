import json
print(json.dumps({"metric": "reads_per_sec_per_chip", "value": 0, "unit": "reads/s", "vs_baseline": 0}))
