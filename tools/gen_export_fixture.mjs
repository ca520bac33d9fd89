#!/usr/bin/env node
// Generates src/test/resources/reference_export_fixture.json: the byte-exact
// output of the reference UI's getJSONfile export (reference index.js:818-836)
// for a value>1500 selection over the ethane+propane example series, inserted
// in sorted compound order. ReferenceDataSpec asserts Selection.exportJson
// reproduces these bytes. Re-run only if the selection rule or the example
// data changes:
//   node tools/gen_export_fixture.mjs
import { readFileSync, writeFileSync } from 'fs';

const UTCoffset = -2; // reference example/config.js:41 (UTCCorrection)

// reference index.js:726-735
const formatISODate = (date, salt) =>
  date.toISOString().replace('T', ' ').slice(0, -8) + ' ' + salt;
// reference index.js:880-885
const mapReplacer = (key, value) =>
  value instanceof Map || value instanceof Set ? [...value] : value;
// reference index.js:895
const regexReplace = (str, search, replacement) =>
  str.replace(new RegExp(search, 'g'), replacement);

const selectionsByDate = new Map();
for (const compound of ['ethane', 'propane']) { // sorted insertion order
  const data = JSON.parse(
    readFileSync(`/root/reference/example/data/${compound}.json`, 'utf8'));
  for (const d of data) {
    if (d.value > 1500.0) {
      // reference index.js:401 epoch correction, then formatISODate keying
      const key = formatISODate(
        new Date((d.date + 60 * 60 * UTCoffset) * 1000), d.flask_number);
      if (!selectionsByDate.has(key)) selectionsByDate.set(key, new Set());
      selectionsByDate.get(key).add(compound);
    }
  }
}

// reference index.js:831-833 (getJSONfile rendering)
const c = new Map([...selectionsByDate.entries()].sort());
let content = JSON.stringify(Object.fromEntries(c), mapReplacer, ' ');
content = regexReplace(content, '],', '],\n');

const out = process.argv[2] ?? 'src/test/resources/reference_export_fixture.json';
writeFileSync(out, content);
console.log(`wrote ${out} (${content.length} bytes, ${c.size} keys)`);
