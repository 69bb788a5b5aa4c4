import { tokenize } from "./tokens";
const DEFAULT_LIMIT = 10;

export function searchIndex(index, query) {
  const terms = tokenize(query);
  const scores = new Map();
  for (const term of terms) {
    const hits = index.get(term) || [];
    for (const hit of hits) {
      scores.set(hit, (scores.get(hit) || 0) + 1);
    }
  }
  return rankResults(scores);
}

export function rankResults(scores) {
  return [...scores.entries()]
    .sort((a, b) => b[1] - a[1])
    .slice(0, DEFAULT_LIMIT);
}

export class SearchIndex {
  constructor() {
    this.index = new Map();
  }

  addDocument(id, text) {
    for (const term of tokenize(text)) {
      if (!this.index.has(term)) {
        this.index.set(term, []);
      }
      this.index.get(term).push(id);
    }
  }
}
